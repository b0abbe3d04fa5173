"""streamroom_bigdata_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference system
``Yaqeen-Aldalow/StreamRoom_BigData`` (Kafka + Spark Structured Streaming +
MongoDB classroom-recommendation pipeline, studied at /root/reference), built
Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured Streaming
for the streaming surface, Pandas UDFs only where built-ins cannot express
the semantics.

Layout:
    session.py    SparkSession factory tuned for local testing / cluster scale
    schemas.py    explicit StructTypes: SmartRoom entities, wire union, fixtures
    sources/      batch + streaming readers (parquet/csv/json/kafka/rate/socket)
    operators/    relational, window, as-of/range join, dedup, similarity,
                  text-analysis, multimodal operators
    functions/    reusable column expressions (vector math, portable hashing)
    plans/        end-to-end query plans (flagship room recommendation)
    streaming/    ingest (csv->json), demux router, event-time windows, state
    registry.py   the queries()/oracle_sql() registry consumed by the driver
"""

__version__ = "0.1.0"
