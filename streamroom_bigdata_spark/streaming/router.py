"""Streaming bronze router (SURVEY.md §2.9 T1-T5, §2.1 S7).

The reference's consumer routes each micro-batch into six MongoDB collections
with six independent filter→dedup→write jobs, re-scanning the uncached batch
each time, with no checkpoint (reference: consumer.scala:57-97). This router
keeps the capability and fixes the anti-patterns (SURVEY.md §4.3):

- ``route_batch`` persists the batch once, then either writes per-entity
  parquet dirs (parity layout) or does a single-pass
  ``partitionBy("source_type")`` write — one job instead of six.
- ``start_router`` wires it under ``writeStream.foreachBatch`` WITH a
  checkpoint location, so restarts resume from offsets instead of replaying.
- Within-batch dedup keeps the reference's per-entity keys
  (consumer.scala:61-91); ``dedup_stream`` upgrades to cross-batch streaming
  dedup with watermark-bounded state (T2 upgrade) — the state store holds
  only keys newer than the watermark, so state is bounded at any scale.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..schemas import ENTITIES


def route_batch(
    batch_df: DataFrame,
    base_dir: str,
    dedup_within_batch: bool = True,
    single_pass: bool = False,
    batch_id: int | None = None,
) -> None:
    """Route one micro-batch into the per-entity bronze store.

    ``single_pass=True`` writes once, hive-partitioned by ``source_type``
    (one shuffle-free job; readers prune partitions). ``single_pass=False``
    writes one parquet dir per entity with that entity's columns only —
    the reference's per-collection layout (consumer.scala:60-94) — off a
    persisted batch so the source is scanned once, not six times.

    ``batch_id`` (round-8 exactly-once upgrade): when set, each entity's
    rows land in a ``batch_id=<id>`` partition directory written with
    OVERWRITE — foreachBatch is only at-least-once (a crash mid-batch
    replays the batch after restart, and plain appends would then
    duplicate every entity dir already written), but an overwrite keyed on
    the checkpoint's monotonic batch id makes the replay IDEMPOTENT: the
    second attempt replaces the partial first attempt byte-for-byte.
    Readers see a ``batch_id`` partition column (prunable; harmless to
    entity projections)."""
    if single_pass:
        if batch_id is None:
            batch_df.write.mode("append").partitionBy("source_type").parquet(
                os.path.join(base_dir, "bronze")
            )
        else:
            # same exactly-once contract as the per-entity branch: the
            # replayed batch OVERWRITES its own batch_id directory instead
            # of appending a second copy. source_type stays a hive
            # partition inside it, so readers still prune on it (partition
            # pruning is order-insensitive across partition columns).
            batch_df.write.mode("overwrite").partitionBy("source_type").parquet(
                os.path.join(base_dir, "bronze", f"batch_id={batch_id}")
            )
        return
    batch_df.persist()
    try:

        def write_entity(item):
            name, (schema, key) = item
            entity = batch_df.filter(F.col("source_type") == name).select(
                *[f.name for f in schema.fields],
                "ingestion_timestamp",
                "ingestion_date",
            )
            if dedup_within_batch:
                entity = entity.dropDuplicates([key])
            if batch_id is None:
                entity.write.mode("append").parquet(os.path.join(base_dir, name))
            else:
                entity.write.mode("overwrite").parquet(
                    os.path.join(base_dir, name, f"batch_id={batch_id}")
                )

        # the six writes are independent jobs over the persisted batch —
        # submit them concurrently so executor slots stay busy (the
        # reference runs them serially AND rescans the source each time)
        with ThreadPoolExecutor(max_workers=len(ENTITIES)) as pool:
            for fut in [pool.submit(write_entity, it) for it in ENTITIES.items()]:
                fut.result()
    finally:
        batch_df.unpersist()


def start_router(
    wire_stream: DataFrame,
    base_dir: str,
    checkpoint_dir: str,
    single_pass: bool = False,
    trigger_once: bool = False,
    idempotent: bool = False,
) -> StreamingQuery:
    """The consumer entry point: parsed wire stream → bronze store under
    ``foreachBatch``, checkpointed (the reference has no checkpoint —
    consumer.scala:57-97; ours restarts exactly-once-ish).

    ``idempotent=True`` upgrades "exactly-once-ish" to exactly-once for
    the bronze files: each entity write lands in a ``batch_id=<epoch>``
    partition with overwrite semantics, so a batch REPLAYED after a
    mid-batch crash replaces its own partial output instead of appending
    a duplicate (see :func:`route_batch`)."""
    writer = (
        wire_stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda df, bid: route_batch(
                df,
                base_dir,
                single_pass=single_pass,
                batch_id=bid if idempotent else None,
            )
        )
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(
    parsed: DataFrame,
    key: str,
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Cross-batch streaming dedup (T2 upgrade): duplicates are dropped across
    micro-batches, with state bounded by the watermark — keys older than
    ``watermark`` age out of the state store, so this runs forever at any
    volume (the reference dedups only within a micro-batch,
    consumer.scala:61-91).

    Dedup is KEY-ONLY, matching the reference's
    ``dropDuplicates("booking_id")`` semantics (consumer.scala:61): the same
    business key arriving later with a *different* timestamp is still a
    duplicate. ``dropDuplicatesWithinWatermark`` gives exactly that — state
    keyed on ``key`` alone, expired once the key's first-seen event time
    falls behind the watermark."""
    return parsed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark([key])


def content_dedup_stream(
    parsed: DataFrame,
    content_cols: list[str],
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact dedup at ingest by CONTENT identity (T2 upgraded once more):
    the reference dedups on the business key (consumer.scala:61-91), which
    misses the retransmit that re-keys the same payload — the shape a
    training-data ingest actually fights (the same document crawled twice
    under two ids). Rows are fingerprinted with ``content_fingerprint``
    (operators/dedup.py — sha256 over '|'-joined canonical column strings;
    column order fixed by the caller's list, so the hash is stable across
    plans AND identical to the batch audit twin ``ingest_content_dedup``),
    then deduped cross-batch on that
    fingerprint with watermark-bounded state — the state store holds one
    64-hex key per distinct payload newer than the watermark, so state is
    bounded at any volume exactly like :func:`dedup_stream`.

    The ``content_hash`` column stays on the output: the bronze router
    downstream can partition or index on it, and the batch twin audits the
    same fingerprint definition retrospectively."""
    from ..operators.dedup import content_fingerprint

    hashed = parsed.withColumn(
        "content_hash", content_fingerprint(*content_cols)
    )
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
