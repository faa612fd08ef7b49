"""ANN literal-construction equivalence: the single-``F.expr`` SQL forms
(query vector, LSH bucket expression) must produce bit-identical results
to the per-element ``F.lit`` construction they replaced — ``repr`` emits
shortest-round-trip decimals and Java's ``Double.parseDouble`` restores
the identical IEEE-754 double."""

import struct

import pyspark.sql.functions as F

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
