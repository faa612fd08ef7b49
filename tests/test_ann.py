"""ANN literal-construction equivalence: the single-``F.expr`` SQL forms
(query vector, LSH bucket expression) must produce bit-identical results
to the per-element ``F.lit`` construction they replaced — ``repr`` emits
shortest-round-trip decimals and Java's ``Double.parseDouble`` restores
the identical IEEE-754 double."""

import struct

import pyspark.sql.functions as F
import pytest

from sparkocr.ann import (
    _dot,
    _hyperplanes,
    _norm,
    _sql_double_array,
    with_cosine,
    with_lsh_bucket,
)


def _vecs(spark, n=50, dim=16):
    # deterministic vectors with awkward doubles (negatives, tiny,
    # near-ties around zero dot products)
    rows = [
        (i, [((i * 31 + j * 17) % 29 - 14) / 9.7 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_sql_double_array_bit_exact(spark):
    planes = _hyperplanes(16, 4)
    vals = list(planes.flatten()) + [
        1e-17, -0.49999999999999994, 3.141592653589793,
        2.2250738585072014e-308,
    ]
    a = spark.range(1).select(
        F.expr(_sql_double_array(vals)).alias("a")).collect()[0]["a"]
    b = spark.range(1).select(
        F.array(*[F.lit(float(v)) for v in vals]).alias("b")
    ).collect()[0]["b"]
    assert [struct.pack("<d", x) for x in a] == \
        [struct.pack("<d", y) for y in b]


def test_sql_double_array_rejects_non_finite():
    """A NaN/Inf element must fail fast with the offending index, not
    reach SQL as an unparseable 'nanD'/'infD' literal (review fix)."""
    with pytest.raises(ValueError, match="element 2"):
        _sql_double_array([0.0, 1.0, float("nan"), 2.0])
    with pytest.raises(ValueError, match="element 0"):
        _sql_double_array([float("inf")])
    with pytest.raises(ValueError, match="element 1"):
        _sql_double_array([1.0, float("-inf")])
    # finite extremes still pass
    _sql_double_array([0.0, -0.0, 1.7976931348623157e308,
                       5e-324, -5e-324])


def test_with_lsh_bucket_equals_lit_form(spark):
    df = _vecs(spark)
    dim, n_planes = 16, 6
    got = {r["vec_id"]: r["bucket"]
           for r in with_lsh_bucket(df, dim, n_planes).collect()}
    # the pre-optimization per-plane F.lit construction, inline
    planes = _hyperplanes(dim, n_planes)
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        pj = F.array(*[F.lit(float(x)) for x in planes[j]])
        bit = (_dot(F.col("embedding"), pj) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, j)
    want = {r["vec_id"]: r["bucket"]
            for r in df.withColumn("bucket", bucket).collect()}
    assert got == want


def test_with_cosine_equals_lit_form(spark):
    df = _vecs(spark)
    qv = [((j * 37) % 13 - 6) / 7.0 for j in range(16)]
    got = {r["vec_id"]: r["cosine"] for r in with_cosine(df, qv).collect()}
    q = F.array(*[F.lit(float(v)) for v in qv])
    denom = _norm(F.col("embedding")) * _norm(q)
    cos = F.when(denom > 0, _dot(F.col("embedding"), q) / denom)
    want = {r["vec_id"]: r["cosine"]
            for r in df.withColumn("cosine", F.round(cos, 4)).collect()}
    assert got == want


def test_width_mismatch_raises_not_silent_empty(spark):
    """zip_with null-pads a mismatched vector, which used to surface as
    NULL cosines/buckets — an EMPTY result from a dedup operator is a
    silent false-clean (review finding). All three entry points must
    fail loudly instead."""
    import pytest
    from pyspark.errors import PySparkException

    from sparkocr.ann import cosine_topk, lsh_topk

    df = _vecs(spark, n=10, dim=16)
    short_q = [0.5] * 8
    with pytest.raises(PySparkException):
        cosine_topk(df, short_q, k=3).collect()
    with pytest.raises(PySparkException):
        with_lsh_bucket(df, dim=8, n_planes=4).collect()
    with pytest.raises(ValueError, match="query vector has 8"):
        lsh_topk(df, short_q, dim=16, k=3)


def test_lsh_topk_query_bucket_matches_sql_fold(spark):
    """The query's own bucket must equal the bucket the SQL fold gives
    the identical stored vector — otherwise the exact-match neighbor
    can fall outside the probe set (review finding)."""
    from sparkocr.ann import lsh_topk

    df = _vecs(spark, n=30, dim=16)
    qv = [float(x) for x in df.where(F.col("vec_id") == 7)
          .head()["embedding"]]
    top = lsh_topk(df, qv, dim=16, k=3, probe_hamming=0).collect()
    assert top and top[0]["vec_id"] == 7 and top[0]["cosine"] == 1.0
