"""Driver-contract conformance: entry() smoke + a DuckDB cross-check of a
representative queries()/oracle_sql() subset at sf0.001 (the full set
runs via scripts/check_correctness.py at sf0.01)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ("part", "lineitem", "events", "documents", "embeddings")

SUBSET = [
    "window_funcs_events",
    "interval_merge_events",
    "posexplode_bigram_documents",
    "doc_metrics_documents",
    "lineitem_agg_stats",
    "embed_topk_neardup_exact",
    "lm_ppl_documents",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "\\N"
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)

    return sorted("\x1f".join(cell(r[i]) for i in order) for r in rows)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 500
    assert {"conv_id", "turn_idx", "n_blocks", "full_text"} <= set(df.columns)
    assert any(r.n_blocks > 0 for r in rows)


def test_every_query_has_an_oracle():
    """Every queries() entry is hash-gated: SQL-expressible ops by real
    DuckDB SQL, non-SQL ops by committed-golden parquet pins (see
    GOLDEN_ORACLE_QUERIES; regenerated via scripts/make_oracle_goldens)."""
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert set(osql) == set(qs), set(qs) ^ set(osql)
    # golden-backed oracles must read a fixture that actually exists
    for name in entrymod.GOLDEN_ORACLE_QUERIES:
        assert "read_parquet" in osql[name], name


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_duckdb_oracle(spark, duck, name):
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    sdf = qs[name](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.execute(osql[name])
    dcols = [d[0] for d in rel.description]
    drows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)
