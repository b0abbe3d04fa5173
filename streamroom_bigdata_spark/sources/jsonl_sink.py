"""Python DataSource WRITER (S9 completion): a committing JSONL sink.

The round-2 Python DataSource covered the read surface (batch reader +
offset-exact stream reader); this adds the WRITE surface of the Spark 4
``pyspark.sql.datasource`` API — batch ``writer()`` and streaming
``streamWriter()`` — implementing the two-phase sink protocol every real
connector needs:

- each TASK writes a uniquely-named staging file and returns its name in a
  ``WriterCommitMessage``;
- the DRIVER's ``commit(messages)`` writes a ``_committed-*`` manifest
  listing exactly the files of successful tasks (speculative/retried task
  attempts leave orphans that readers must ignore);
- ``abort()`` records nothing — a failed job leaves no committed manifest,
  so partial output is invisible.

``read_committed`` is the matching read path: parquet/JSON scan constrained
to manifested files only. At cluster scale this is the same
task-commit/driver-commit contract as FileOutputCommitter v2 / Iceberg
snapshot commit — O(tasks) strings through the driver, data never.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class JsonlCommitMessage(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class _JsonlWriterBase:
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_commit sink requires option 'path'")

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return JsonlCommitMessage(name, n)

    def _write_manifest(self, messages, suffix: str) -> None:
        manifest = {
            "files": sorted(m.filename for m in messages if m is not None),
            "rows": sum(m.n_rows for m in messages if m is not None),
        }
        tmp = os.path.join(self.path, f"._manifest-{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        # rename is the atomic commit point
        os.replace(tmp, os.path.join(self.path, f"_committed-{suffix}"))


class JsonlBatchWriter(_JsonlWriterBase, DataSourceWriter):
    def commit(self, messages):
        # unique manifest per job: a second append to the same path must
        # COMPOSE with (not replace) the first commit's manifest —
        # read_committed unions all _committed-* manifests
        self._write_manifest(messages, f"batch-{uuid.uuid4().hex}")

    def abort(self, messages):
        pass  # no manifest → nothing is visible


class JsonlStreamWriter(_JsonlWriterBase, DataSourceStreamWriter):
    def commit(self, messages, batchId: int):  # noqa: N803 (API name)
        self._write_manifest(messages, f"{batchId:020d}")

    def abort(self, messages, batchId: int):  # noqa: N803
        pass


class JsonlCommitDataSource(DataSource):
    """``df.write.format("jsonl_commit").option("path", d).save()`` and the
    ``writeStream`` twin. Register with
    ``spark.dataSource.register(JsonlCommitDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_commit"

    def writer(self, schema, overwrite: bool) -> JsonlBatchWriter:
        if overwrite:
            # truncating previously committed manifests is not implemented —
            # refuse rather than silently append under overwrite semantics
            raise ValueError(
                "jsonl_commit supports append mode only; use mode('append')"
            )
        return JsonlBatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> JsonlStreamWriter:
        return JsonlStreamWriter(self.options)


def read_committed(path: str) -> list[dict]:
    """Rows from COMMITTED files only — orphaned staging files from
    failed/speculative attempts are invisible. Manifests replay in commit
    order (mtime, name tiebreak): within a job, file-then-line order;
    across jobs, earlier commits first. Streaming manifests additionally
    carry the zero-padded batch id in their name."""
    manifests = [
        e for e in os.listdir(path) if e.startswith("_committed-")
    ]
    manifests.sort(
        key=lambda e: (os.path.getmtime(os.path.join(path, e)), e)
    )
    files: list[str] = []
    for entry in manifests:
        with open(os.path.join(path, entry)) as f:
            files.extend(json.load(f)["files"])
    rows: list[dict] = []
    for name in files:
        with open(os.path.join(path, name)) as f:
            rows.extend(json.loads(line) for line in f)
    return rows
