"""Arrow batch-boundary invariance: every pandas/Arrow kernel in the
package is designed batch-local (the rolling window hash's flat cumsum,
the Gopher battery's per-doc Counters, bpe_encode's per-batch word
cache, the extraction engine's mapInPandas) — so shrinking
``spark.sql.execution.arrow.maxRecordsPerBatch`` to a handful of rows
must change NOTHING in any output. A cross-batch state leak or a
flat-array stitching bug shows up immediately at batch size 3."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
BATCH_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"


@pytest.fixture
def tiny_batches(spark):
    old = spark.conf.get(BATCH_KEY, None)
    yield
    if old is None:
        spark.conf.unset(BATCH_KEY)
    else:
        spark.conf.set(BATCH_KEY, old)


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def _run_at(spark, batch_size, build):
    spark.conf.set(BATCH_KEY, str(batch_size))
    try:
        return _collect_sorted(build())
    finally:
        spark.conf.set(BATCH_KEY, "10000")


def test_window_hashes_batch_invariant(spark, tiny_batches):
    from sparkocr.analysis import _window_hashes

    docs = spark.read.parquet(f"{SF}/documents.parquet")

    def build():
        return _window_hashes(docs, "doc_id", "text", 12)

    assert _run_at(spark, 3, build) == _run_at(spark, 10000, build)


def test_substr_dedup_batch_invariant(spark, tiny_batches):
    from sparkocr.analysis import dedup_substrings

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(120)

    def build():
        return dedup_substrings(docs, "doc_id", min_len=10)

    assert _run_at(spark, 2, build) == _run_at(spark, 10000, build)


def test_gopher_battery_batch_invariant(spark, tiny_batches):
    from sparkocr.analysis import gopher_repetition_signals

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(150)

    def build():
        return gopher_repetition_signals(docs, "doc_id")

    assert _run_at(spark, 1, build) == _run_at(spark, 10000, build)


def test_bpe_encode_batch_invariant(spark, tiny_batches):
    from sparkocr.lm import bpe_encode, train_bpe

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(80)
    merges = train_bpe(docs, num_merges=30, max_words=2000)

    def build():
        return bpe_encode(docs, merges).select(
            "doc_id", F.col("bpe_tokens").cast("string"))

    assert _run_at(spark, 2, build) == _run_at(spark, 10000, build)


def test_engine_extract_batch_invariant(spark, tiny_batches):
    from sparkocr.engine import SparkOcrEngine
    from sparkocr.fixtures import turns_pandas

    df = spark.createDataFrame(turns_pandas(seed=11, n_convs=4))
    eng = SparkOcrEngine(spark)

    def build():
        return eng.extract(df).select("conv_id", "turn_idx", "full_text")

    assert _run_at(spark, 4, build) == _run_at(spark, 10000, build)
