"""Paragraph-level exact dedup (first occurrence wins) and token-budget
corpus mixing: hand goldens, invariants, and DuckDB oracle cross-checks."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sparkocr.analysis import dedup_paragraphs, mix_corpus

SEP = "\n\n"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# dedup_paragraphs


def test_paragraph_dedup_hand_golden(spark):
    # "shared paragraph" appears in docs 0, 1, 2 — survives only in
    # doc 0 (first occurrence under (doc, pos) order); unique content
    # is untouched; short paragraphs are exempt even when repeated
    rows = [
        (0, SEP.join(["alpha unique one", "shared paragraph x", "tail"])),
        (1, SEP.join(["shared paragraph x", "beta unique two", "tail"])),
        (2, SEP.join(["gamma unique three", "shared paragraph x"])),
    ]
    got = {r["doc"]: (r["clean_text"], r["n_paras_kept"])
           for r in dedup_paragraphs(_docs(spark, rows), "doc_id").collect()}
    # "tail" (4 chars < min_para_chars=8) is exempt and kept everywhere
    assert got == {
        0: (SEP.join(["alpha unique one", "shared paragraph x", "tail"]), 3),
        1: (SEP.join(["beta unique two", "tail"]), 2),
        2: ("gamma unique three", 1),
    }


def test_paragraph_dedup_all_duplicate_doc_survives_empty(spark):
    rows = [
        (0, "only paragraph here"),
        (1, "only paragraph here"),
    ]
    got = {r["doc"]: (r["clean_text"], r["n_paras_kept"])
           for r in dedup_paragraphs(_docs(spark, rows), "doc_id").collect()}
    assert got == {0: ("only paragraph here", 1), 1: ("", 0)}


def test_paragraph_dedup_first_occurrence_is_positional(spark):
    # within ONE doc a repeated paragraph keeps only its first position
    rows = [(5, SEP.join(["repeat me paragraph", "middle bit unique",
                          "repeat me paragraph"]))]
    got = dedup_paragraphs(_docs(spark, rows), "doc_id").collect()[0]
    assert got["clean_text"] == SEP.join(
        ["repeat me paragraph", "middle bit unique"])
    assert got["n_paras_kept"] == 2


def test_paragraph_dedup_matches_duckdb_oracle(spark):
    """Independent oracle: first-occurrence-wins as a row_number window
    over string paragraph keys (no hashes, no sparkocr code)."""
    # deterministic corpus with heavy cross-doc repetition
    pool = [f"paragraph body number {i % 7} with shared text" for i in range(9)]
    rows = [
        (d, SEP.join(pool[(d * 3 + j) % len(pool)]
                     for j in range(1 + d % 4)))
        for d in range(40)
    ]
    got = sorted(
        (r["doc"], r["clean_text"], r["n_paras_kept"])
        for r in dedup_paragraphs(
            _docs(spark, rows).repartition(7), "doc_id").collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?)", rows)
    oracle = con.execute(r"""
        WITH paras AS (
          SELECT doc,
                 generate_subscripts(string_split(text, E'\n\n'), 1) - 1 AS pos,
                 unnest(string_split(text, E'\n\n')) AS para
          FROM d
        ), ranked AS (
          SELECT doc, pos, para,
                 CASE WHEN length(para) < 8 THEN 1
                      ELSE row_number() OVER (
                        PARTITION BY CASE WHEN length(para) >= 8
                                          THEN para END
                        ORDER BY doc, pos) END AS rn
          FROM paras
        ), agg AS (
          SELECT doc,
                 string_agg(para, E'\n\n' ORDER BY pos) AS clean_text,
                 count(*) AS n_paras_kept
          FROM ranked WHERE rn = 1 GROUP BY doc
        )
        SELECT d2.doc, coalesce(a.clean_text, '') AS clean_text,
               CAST(coalesce(a.n_paras_kept, 0) AS BIGINT) AS n_paras_kept
        FROM (SELECT DISTINCT doc FROM paras) d2
        LEFT JOIN agg a USING (doc)
    """).fetchall()
    assert got == sorted(oracle)


# ---------------------------------------------------------------------------
# mix_corpus


def _corpus(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long")


def _naive_oracle(rows, weights, total):
    """The spec, straight: per-source md5 order, keep while the running
    total BEFORE the doc is under the source's target."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, source VARCHAR, n_tokens BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    wsum = sum(weights.values())
    targets = ", ".join(
        f"('{s}', {int(round(w / wsum * total))})"
        for s, w in sorted(weights.items()))
    return con.execute(f"""
        WITH tg(source, target) AS (VALUES {targets}),
        o AS (
          SELECT t.source, t.doc_id, t.n_tokens, tg.target,
                 coalesce(sum(t.n_tokens) OVER (
                   PARTITION BY t.source
                   ORDER BY md5(CAST(t.doc_id AS VARCHAR)), t.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
          FROM t JOIN tg USING (source)
        )
        SELECT source, doc_id, n_tokens FROM o WHERE cum_before < target
    """).fetchall()


def test_mix_corpus_matches_naive_oracle_at_any_bucketing(spark):
    rows = [(i, f"s{i % 3}", (i * 7919) % 50 + 1) for i in range(600)]
    weights = {"s0": 0.6, "s1": 0.3, "s2": 0.1}
    total = 3000
    oracle = sorted(_naive_oracle(rows, weights, total))
    df = _corpus(spark, rows)
    for nb in (1, 7, 256):
        got = sorted(
            (r["source"], r["doc_id"], r["n_tokens"])
            for r in mix_corpus(df.repartition(11), weights, total,
                                n_buckets=nb).collect()
        )
        assert got == oracle, f"n_buckets={nb} diverged from the spec"


def test_mix_corpus_meets_target_within_one_doc(spark):
    rows = [(i, "web" if i % 2 else "code", 10 + i % 13)
            for i in range(400)]
    weights = {"web": 3.0, "code": 1.0}
    total = 2000
    out = mix_corpus(_corpus(spark, rows), weights, total).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["n_tokens"])
    for src, target in (("web", 1500), ("code", 500)):
        got = sum(by_src[src])
        # reached, overshot by less than the largest doc
        assert target <= got < target + max(by_src[src])


def test_mix_corpus_small_source_contributes_everything(spark):
    rows = [(i, "tiny", 5) for i in range(10)] + \
           [(100 + i, "big", 50) for i in range(100)]
    out = mix_corpus(_corpus(spark, rows), {"tiny": 0.5, "big": 0.5}, 4000)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["tiny"] == 10  # 50 tokens available vs 2000 target
    assert 0 < counts["big"] <= 100


def test_mix_corpus_unlisted_source_contributes_nothing(spark):
    rows = [(1, "a", 10), (2, "b", 10)]
    out = mix_corpus(_corpus(spark, rows), {"a": 1.0}, 100).collect()
    assert [(r["source"], r["doc_id"]) for r in out] == [("a", 1)]


def test_mix_corpus_rejects_bad_args(spark):
    df = _corpus(spark, [(1, "a", 10)])
    with pytest.raises(ValueError):
        mix_corpus(df, {}, 100)
    with pytest.raises(ValueError):
        mix_corpus(df, {"a": -1.0}, 100)
    with pytest.raises(ValueError):
        mix_corpus(df, {"a": 1.0}, -5)
    with pytest.raises(ValueError):
        mix_corpus(df, {"a": 1.0}, 100, n_buckets=0)
    with pytest.raises(ValueError):
        mix_corpus(df, {"a": 1.0}, 100, n_buckets=65537)
