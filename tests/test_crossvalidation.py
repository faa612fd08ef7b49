"""Non-circular validation of the banded near-dup operators: each banded
/ LSH plan is compared against a brute-force O(n²) reference computed in
numpy from the SAME inputs at sf0.001. These are the independent checks
behind the committed-golden oracle pins (tests/fixtures/oracle/) — the
pins catch regressions, these prove the pinned behavior is right."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text")


def test_simhash_banded_join_equals_brute_force(spark, docs):
    """The 4×16-bit banded equi-join + residual filter must find EXACTLY
    the pairs a brute-force scan over the simhash values finds (the
    pigeonhole argument, verified end-to-end), including the planted
    one-token-edit near-dups the driver query uses."""
    from pyspark.sql import functions as F

    from sparkocr.analysis import simhash64, simhash_neardup_pairs

    planted = (
        docs.orderBy("doc_id").limit(30)
        .withColumn("doc_id", F.col("doc_id") + 2000000)
        .withColumn("text", F.concat(F.lit("copy "), F.col("text")))
    )
    corpus = docs.unionByName(planted)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash_neardup_pairs(corpus, "doc_id",
                                          max_hamming=3).collect()}

    # brute force over the same simhash values (numpy, all pairs)
    sh = simhash64(corpus, "doc_id").select("doc_id", "simhash").collect()
    # apply the same min-token floor the banded op uses
    n_tok = {r["doc_id"]: len(r["text"].split(" "))
             for r in corpus.collect()}
    ids = np.array([r["doc_id"] for r in sh if n_tok[r["doc_id"]] >= 2])
    # signed int64 from Spark → reinterpret the bits as uint64 (a direct
    # np.uint64() of a negative python int is deprecated in numpy)
    vals = np.array([r["simhash"] for r in sh
                     if n_tok[r["doc_id"]] >= 2],
                    dtype=np.int64).view(np.uint64)
    xor = vals[:, None] ^ vals[None, :]
    ham = np.zeros_like(xor, dtype=np.int64)
    for b in range(64):
        ham += ((xor >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
    ii, jj = np.where((ham <= 3) & (ids[:, None] < ids[None, :]))
    exp = {(int(ids[i]), int(ids[j])): int(ham[i, j]) for i, j in zip(ii, jj)}
    assert got == exp
    assert len(exp) > 0  # the planted edits actually produce near-dups


def test_minhash_banded_join_equals_brute_force(spark, docs):
    """The banded LSH candidate join must emit EXACTLY the pairs whose
    signatures agree on at least one full band (brute-forced in numpy
    from the same signature table), each exactly once, with the exact
    signature-agreement estimate."""
    from sparkocr.analysis import minhash_lsh_pairs, minhash_signatures

    n_hashes, bands = 32, 8
    rpb = n_hashes // bands
    got = {(r["doc_a"], r["doc_b"]): r["est_jaccard"]
           for r in minhash_lsh_pairs(docs, "doc_id", n_shingle=2,
                                      n_hashes=n_hashes,
                                      bands=bands).collect()}
    sig_rows = minhash_signatures(docs, "doc_id", n_shingle=2,
                                  n_hashes=n_hashes).collect()
    ids = np.array([r["doc"] for r in sig_rows])
    sigs = np.array([r["signature"] for r in sig_rows], dtype=np.int64)
    exp = {}
    n = len(ids)
    for i in range(n):
        for j in range(n):
            if ids[i] >= ids[j]:
                continue
            band_agree = any(
                np.array_equal(sigs[i, b * rpb:(b + 1) * rpb],
                               sigs[j, b * rpb:(b + 1) * rpb])
                for b in range(bands)
            )
            if band_agree:
                # Spark's round() is HALF_UP; Python's is banker's —
                # 29/32 = 0.90625 must pin to 0.9063, not 0.9062
                import decimal

                est = float(
                    decimal.Decimal(float((sigs[i] == sigs[j]).sum())
                                    / n_hashes)
                    .quantize(decimal.Decimal("0.0001"),
                              rounding=decimal.ROUND_HALF_UP))
                exp[(int(ids[i]), int(ids[j]))] = est
    assert got == exp
    assert len(exp) > 0


def test_minhash_contains_all_exact_duplicates(spark, docs):
    """Identical documents have identical shingle sets → identical
    signatures → every band agrees → the pair MUST be a candidate with
    est_jaccard 1.0 (the superset bound the oracle pin can't prove)."""
    from pyspark.sql import functions as F

    from sparkocr.analysis import minhash_lsh_pairs

    dup = docs.orderBy("doc_id").limit(25).withColumn(
        "doc_id", F.col("doc_id") + 5000000)
    corpus = docs.unionByName(dup)
    got = {(r["doc_a"], r["doc_b"]): r["est_jaccard"]
           for r in minhash_lsh_pairs(corpus, "doc_id",
                                      n_shingle=2).collect()}
    n_tok = {r["doc_id"]: len(r["text"].split(" "))
             for r in dup.collect()}
    for r in docs.orderBy("doc_id").limit(25).collect():
        twin = r["doc_id"] + 5000000
        if n_tok[twin] >= 2:  # docs with <2 tokens have no shingles
            assert got.get((r["doc_id"], twin)) == 1.0, r["doc_id"]


def test_ivf_full_probe_equals_exact_and_is_deterministic(spark):
    """IVF with nprobe == nlist degenerates to exact brute force — the
    approximate index must then reproduce cosine_topk exactly; partial
    probing keeps a sane recall and is run-to-run deterministic (seeded
    centroids, rounded Lloyd means)."""
    from pyspark.sql import functions as F

    from sparkocr.ann import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = list(emb.where(F.col("vec_id") == 1).select("embedding").head()[0])
    dim = len(qv)
    exact = [(r["vec_id"], r["cosine"])
             for r in cosine_topk(emb, qv, k=10).collect()]
    full = [(r["vec_id"], r["cosine"])
            for r in ivf_topk(emb, qv, dim=dim, k=10,
                              nlist=8, nprobe=8).collect()]
    assert full == exact
    a = [(r["vec_id"], r["cosine"])
         for r in ivf_topk(emb, qv, dim=dim, k=10,
                           nlist=16, nprobe=4).collect()]
    b = [(r["vec_id"], r["cosine"])
         for r in ivf_topk(emb, qv, dim=dim, k=10,
                           nlist=16, nprobe=4).collect()]
    assert a == b
    recall = len({x for x, _ in a} & {x for x, _ in exact}) / 10
    assert recall >= 0.3, recall
