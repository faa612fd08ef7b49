"""Scale semantics: skew rebalancing, parallelism-invariant results,
deterministic ordered sinks, format-negotiating sources."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sparkocr.engine import SparkOcrEngine, ordered, with_rank
from sparkocr.sources import (
    iceberg_available,
    read_transcripts,
    write_json_blocks,
    write_ordered,
    write_text,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """One whale conversation (2000 turns) + 50 minnows (10 turns)."""
    rows = [("whale", i, "user", f"<p>whale turn {i} says interesting things.</p>")
            for i in range(2000)]
    for c in range(50):
        rows += [(f"minnow-{c}", i, "user", f"<p>minnow {c} turn {i} text.</p>")
                 for i in range(10)]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")


def test_whale_conversation_rebalances(spark, skewed):
    eng = SparkOcrEngine(spark)
    out = eng.extract(skewed, repartition=16)
    # the whale must NOT serialize on one task: round-robin repartition
    # spreads its turns across all partitions (the salted-compute move)
    sizes = [
        r["count"]
        for r in skewed.repartition(16)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().collect()
    ]
    assert len(sizes) == 16
    assert max(sizes) <= 2 * (sum(sizes) / len(sizes))
    assert out.count() == 2500
    assert out.where(F.col("error_code").isNotNull()).count() == 0


def test_results_invariant_under_parallelism(spark, skewed):
    """Same input at 1 partition and 13 partitions → identical rows
    (the local[8]-vs-local[32] text-equality requirement in miniature)."""
    eng = SparkOcrEngine(spark)
    a = {(r["conv_id"], r["turn_idx"]): r["full_text"]
         for r in eng.extract(skewed.repartition(1)).collect()}
    b = {(r["conv_id"], r["turn_idx"]): r["full_text"]
         for r in eng.extract(skewed.repartition(13)).collect()}
    assert a == b


def test_ordered_and_rank_are_deterministic(spark, skewed):
    eng = SparkOcrEngine(spark)
    out = eng.extract(skewed.repartition(13))
    got = [(r["conv_id"], r["turn_idx"]) for r in ordered(out).collect()]
    assert got == sorted(got)
    ranked = with_rank(out.select("conv_id", "turn_idx"))
    rows = ranked.orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert [(r["conv_id"], r["turn_idx"]) for r in rows] == sorted(got)


def test_sinks_round_trip(spark, skewed, tmp_path):
    eng = SparkOcrEngine(spark)
    out = eng.extract(skewed.where(F.col("conv_id") != "whale")).cache()

    p = str(tmp_path / "ordered")
    write_ordered(out.select("conv_id", "turn_idx", "n_blocks", "full_text"), p)
    back = read_transcripts(spark, p)
    assert back.count() == 500

    t = str(tmp_path / "text")
    write_text(out, t)
    lines = spark.read.text(t)
    assert lines.count() == 500

    j = str(tmp_path / "json")
    write_json_blocks(out.select("conv_id", "turn_idx", "blocks"), j)
    rec = json.loads(spark.read.text(j).head()["value"])
    assert {"conv_id", "turn_idx", "blocks"} <= set(rec)

    assert iceberg_available(spark) in (True, False)  # no jar here: False


def test_iceberg_write_round_trip(spark, skewed, tmp_path):
    """The Iceberg branch of write_ordered, exercised when (and only
    when) the runtime jar is on the classpath. This sandbox has no
    network and ships no iceberg-spark-runtime jar anywhere on disk
    (verified: `find / -iname '*iceberg*'` is empty), so the test skips
    here and the parquet fallback above carries the coverage — on any
    real deployment with the jar, this test runs the sorted
    createOrReplace path end to end."""
    import pytest

    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar in this sandbox (offline; "
                    "not vendorable) — parquet fallback tested above")
    spark.conf.set("spark.sql.catalog.local",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.local.type", "hadoop")
    spark.conf.set("spark.sql.catalog.local.warehouse",
                   str(tmp_path / "iceberg_wh"))
    eng = SparkOcrEngine(spark)
    out = eng.extract(skewed.where(F.col("conv_id") != "whale"))
    write_ordered(out.select("conv_id", "turn_idx", "n_blocks",
                             "full_text"),
                  "local.db.extract_out", fmt="iceberg")
    back = read_transcripts(spark, "local.db.extract_out",
                            fmt="iceberg")
    assert back.count() == 500


def test_debug_html_sink(spark, skewed, tmp_path):
    from sparkocr.engine import SparkOcrEngine
    from sparkocr.sources import debug_html, write_debug_html

    src = skewed.where(F.col("conv_id") == "minnow-0")
    out = SparkOcrEngine(spark).extract(src)
    loc = str(tmp_path / "dbg")
    write_debug_html(out, loc, text_df=src, limit=5)
    html = open(f"{loc}/debug.html", encoding="utf-8").read()
    assert "<mark" in html and "minnow-0" in html
    # unit: spans wrap exactly the original slice, escaped
    h = debug_html("a<b> C D </b>e", [
        {"start": 4, "end": 8, "block_type": "prose"}])
    assert "&lt;b&gt;" in h and "<mark" in h and " C D" in h
    # an inverted span (end < start) from a corrupt row must not re-emit
    # any text range twice (review finding)
    import re
    h2 = debug_html("abcdefgh", [{"start": 5, "end": 2, "block_type": "prose"}])
    assert re.sub("<[^>]*>", "", h2) == "abcdefgh"


def test_to_arrow_handoff(spark):
    """S8 parity: the ordered result hands off as a pyarrow.Table
    (the Arrow C-data analog of the reference's C-ABI sink)."""
    import pyarrow as pa

    from sparkocr.engine import SparkOcrEngine
    from sparkocr.fixtures import turns_pandas
    from sparkocr.sources import to_arrow

    df = spark.createDataFrame(turns_pandas(seed=3, n_convs=2))
    out = SparkOcrEngine(spark).extract(df) \
        .select("conv_id", "turn_idx", "n_blocks", "full_text")
    tbl = to_arrow(out, limit=10)
    assert isinstance(tbl, pa.Table)
    assert tbl.num_rows == 10
    keys = list(zip(tbl["conv_id"].to_pylist(), tbl["turn_idx"].to_pylist()))
    assert keys == sorted(keys)  # ordered handoff
