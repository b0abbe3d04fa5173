"""Python DataSource WRITER (S9 write surface): committing JSONL sink —
task-staging + driver-manifest two-phase commit."""

from __future__ import annotations

import json
import os
import time

import pytest

from streamroom_bigdata_spark.sources.jsonl_sink import (
    JsonlCommitDataSource,
    read_committed,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(JsonlCommitDataSource)
    return spark


def test_batch_write_commits_manifest(registered, tmp_path):
    out = str(tmp_path / "sink")
    df = registered.range(0, 100, 1, 4).selectExpr("id", "id * 2 AS dbl")
    df.write.format("jsonl_commit").option("path", out).mode("append").save()

    manifests = [f for f in os.listdir(out) if f.startswith("_committed-batch")]
    assert len(manifests) == 1
    manifest = json.load(open(os.path.join(out, manifests[0])))
    assert manifest["rows"] == 100
    assert len(manifest["files"]) == 4  # one staging file per task
    rows = read_committed(out)
    assert sorted(r["id"] for r in rows) == list(range(100))
    assert all(r["dbl"] == 2 * r["id"] for r in rows)


def test_second_append_composes_not_replaces(registered, tmp_path):
    """Append twice: both jobs' committed rows remain visible (unique
    manifest per job — a fixed manifest name would hide the first)."""
    out = str(tmp_path / "sink")
    registered.range(0, 5).write.format("jsonl_commit").option(
        "path", out
    ).mode("append").save()
    registered.range(100, 105).write.format("jsonl_commit").option(
        "path", out
    ).mode("append").save()
    assert sorted(r["id"] for r in read_committed(out)) == [
        0, 1, 2, 3, 4, 100, 101, 102, 103, 104,
    ]


def test_overwrite_mode_is_refused(registered, tmp_path):
    import pytest

    with pytest.raises(Exception, match="append"):
        registered.range(0, 5).write.format("jsonl_commit").option(
            "path", str(tmp_path / "sink")
        ).mode("overwrite").save()


def test_orphaned_staging_files_are_invisible(registered, tmp_path):
    """A file not listed in any manifest (failed/speculative task attempt)
    must not surface through the committed-read path."""
    out = str(tmp_path / "sink")
    registered.range(0, 10, 1, 2).write.format("jsonl_commit").option(
        "path", out
    ).mode("append").save()
    with open(os.path.join(out, "part-orphan.jsonl"), "w") as f:
        f.write(json.dumps({"id": 999999}) + "\n")
    assert all(r["id"] != 999999 for r in read_committed(out))
    assert len(read_committed(out)) == 10


def test_stream_write_commits_per_batch(registered, tmp_path):
    """Streaming writer: every micro-batch gets its own committed manifest;
    committed rows equal the source rows exactly."""
    src = tmp_path / "src"
    src.mkdir()
    for i, batch in enumerate(([1, 2, 3], [4, 5])):
        p = src / f"b{i}.json"
        p.write_text("\n".join(json.dumps({"v": v}) for v in batch))
        os.utime(p, (1000 + i, 1000 + i))  # deterministic batch order
    out = str(tmp_path / "sink")
    q = (
        registered.readStream.schema("v long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .writeStream.format("jsonl_commit")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    manifests = [f for f in os.listdir(out) if f.startswith("_committed-")]
    assert len(manifests) == 2  # one per micro-batch
    assert sorted(r["v"] for r in read_committed(out)) == [1, 2, 3, 4, 5]
