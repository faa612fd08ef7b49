"""barrier.pin: the package-wide materialization barrier.

Without a checkpoint dir it is an executor-local checkpoint (the
sandbox/test default); with ``sc.setCheckpointDir`` configured it
upgrades to a RELIABLE checkpoint — the 100 TB posture where executor
loss cannot invalidate a pinned subplan. Every pin call site in the
package flows through this helper, so exercising both physical forms
here covers the whole family's storage contract."""

import pytest
from pyspark.sql import functions as F

from sparkocr.barrier import pin
from sparkocr.engine import with_rank


def test_pin_without_dir_is_local(spark):
    assert spark.sparkContext.getCheckpointDir() is None
    out = pin(spark.range(100).withColumn("x", F.col("id") * 2))
    assert out.count() == 100
    assert out.agg(F.sum("x")).collect()[0][0] == 9900


def test_pin_with_dir_is_reliable_and_with_rank_survives(spark, tmp_path):
    sc = spark.sparkContext
    ckpt = tmp_path / "ckpt"
    sc.setCheckpointDir(str(ckpt))
    try:
        out = pin(spark.range(1000).withColumn("x", F.col("id") % 7))
        assert out.count() == 1000
        # the reliable path actually engaged: checkpoint part files
        # landed under the configured dir (localCheckpoint writes none)
        files = [p for p in ckpt.rglob("*") if p.is_file()]
        assert files, "no reliable checkpoint files were written"

        # with_rank's determinism pin rides the same helper: ranks must
        # be a dense 1..N permutation consistent with the key order
        df = spark.createDataFrame(
            [("c%02d" % (i % 13), i // 13) for i in range(400)],
            "conv_id string, turn_idx int",
        )
        ranked = with_rank(df).collect()
        assert sorted(r.rank for r in ranked) == list(range(1, 401))
        by_rank = sorted(ranked, key=lambda r: r.rank)
        keys = [(r.conv_id, r.turn_idx) for r in by_rank]
        assert keys == sorted(keys)
    finally:
        sc.setCheckpointDir(None)
        assert sc.getCheckpointDir() is None
