"""Resume-from-checkpoint semantics: exactly-once output across an
interrupted run, ledger metrics, lineage validation."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sparkocr.checkpoint import (
    done_buckets,
    read_checkpointed,
    run_checkpointed,
)
from sparkocr.config import FLAGSHIP_CONFIG


@pytest.fixture(scope="module")
def transcripts(spark):
    rows = [
        (f"conv-{i % 23}", i, "user" if i % 3 else "assistant",
         f"<p>turn {i} body text with enough words to detect.</p>")
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")


def test_interrupted_run_resumes_exactly_once(spark, transcripts, tmp_path):
    out = str(tmp_path / "ckpt")
    # simulate a kill after the first batch (commit point = ledger write,
    # so stopping between batches == a kill between batches)
    s1 = run_checkpointed(spark, transcripts, out, n_buckets=8,
                          batch_buckets=3, max_batches=1)
    assert s1["processed"] == [0, 1, 2]
    assert done_buckets(out) == {0, 1, 2}
    partial = read_checkpointed(spark, out)
    n_partial = partial.count()
    assert 0 < n_partial < 400

    # resume: completes only the remaining buckets
    s2 = run_checkpointed(spark, transcripts, out, n_buckets=8, batch_buckets=3)
    assert s2["already_done"] == [0, 1, 2]
    assert sorted(s2["processed"]) == [3, 4, 5, 6, 7]
    full = read_checkpointed(spark, out)
    assert full.count() == 400  # no duplicates, no losses
    assert full.select("conv_id", "turn_idx").distinct().count() == 400

    # idempotent re-run: nothing left to do
    s3 = run_checkpointed(spark, transcripts, out, n_buckets=8, batch_buckets=3)
    assert s3["processed"] == [] and s3["remaining"] == []


def test_ledger_carries_metrics_and_lineage(spark, transcripts, tmp_path):
    out = str(tmp_path / "ckpt")
    run_checkpointed(spark, transcripts, out, n_buckets=4, batch_buckets=4)
    entries = [
        json.load(open(os.path.join(out, "_ledger", f)))
        for f in sorted(os.listdir(os.path.join(out, "_ledger")))
        if f.startswith("bucket=")
    ]
    assert len(entries) == 4
    assert sum(e["n_turns"] for e in entries) == 400
    for e in entries:
        assert e["n_blocks"] > 0
        assert 0.0 <= e["empty_rate"] <= 1.0
        assert e["n_errors"] == 0
        assert e["lineage"]["n_buckets"] == 4
        assert e["lineage"]["config_hash"]


def test_lineage_mismatch_refuses_to_mix(spark, transcripts, tmp_path):
    out = str(tmp_path / "ckpt")
    run_checkpointed(spark, transcripts, out, n_buckets=4, batch_buckets=2,
                     max_batches=1)
    with pytest.raises(ValueError, match="lineage mismatch"):
        run_checkpointed(
            spark, transcripts, out, n_buckets=4, batch_buckets=2,
            config=FLAGSHIP_CONFIG.with_overrides(merge_boxes=False),
        )


def test_retried_batch_overwrites_not_appends(spark, transcripts, tmp_path):
    """A batch that ran but never committed its ledger entry re-runs on
    resume and must replace its partitions (dynamic overwrite), not
    append duplicates."""
    out = str(tmp_path / "ckpt")
    run_checkpointed(spark, transcripts, out, n_buckets=4, batch_buckets=2,
                     max_batches=1)
    # forge the kill-after-write-before-ledger state: delete the ledger
    # entries but keep the data partitions
    ldir = os.path.join(out, "_ledger")
    for f in os.listdir(ldir):
        if f.startswith("bucket="):
            os.remove(os.path.join(ldir, f))
    run_checkpointed(spark, transcripts, out, n_buckets=4, batch_buckets=4)
    full = read_checkpointed(spark, out)
    assert full.count() == 400
    assert full.groupBy("conv_id", "turn_idx").count().where(F.col("count") > 1).count() == 0


def test_empty_input_run_reads_back_empty(spark, transcripts, tmp_path):
    """A completed run whose buckets all held zero rows writes NO
    parquet files; read_checkpointed must return an empty DataFrame
    with the extraction schema (from the ledger), not crash on schema
    inference (review finding)."""
    out_dir = str(tmp_path / "empty_run")
    empty = transcripts.where(F.lit(False))
    summary = run_checkpointed(spark, empty, out_dir, n_buckets=4,
                               batch_buckets=4)
    assert summary["processed"] == [0, 1, 2, 3]
    assert done_buckets(out_dir) == {0, 1, 2, 3}
    back = read_checkpointed(spark, out_dir)
    assert back.count() == 0
    assert "full_text" in back.columns and "bucket" in back.columns
