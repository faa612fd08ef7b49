"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``      — flagship extraction over sf0.001 documents.
``queries()``         — one DataFrame callable per implemented operator
                        (SURVEY.md §2 + training-data ops).
``oracle_sql()``      — a DuckDB oracle for EVERY query: real ANSI SQL
                        where SQL can express the op (same column
                        names/aliases both sides; float aggregates
                        rounded identically; integer aggregates CAST to
                        BIGINT — DuckDB promotes ``sum`` to HUGEINT,
                        which the driver's hash formatter renders
                        differently than BIGINT), committed-golden
                        parquet pins (``GOLDEN_ORACLE_QUERIES``) where
                        it can't — so the driver's rows+schema+hash
                        gate covers all 50 queries. The pins are
                        regression gates; the behavior behind them is
                        independently validated in pytest
                        (hand-authored fixtures, brute-force
                        cross-checks, unit suites).

The driver's correctness harness runs at most ~50 queries in
``queries()`` dict order (round-2 artifact stopped at exactly 50 of the
then-58), so the contract is sized to 50 entries — related single-
operator probes are merged into one multi-column query (each operator's
columns still hash-verified), and the dict is ordered least-verified
first so any truncation drops only queries that were already green in a
prior round AND remain pytest-gated.
"""

from __future__ import annotations

import os as _os

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


_SHIPPED: set = set()
_ZIP_PATH: str | None = None


def _ensure_pkg(spark: SparkSession) -> None:
    """Ship sparkocr to executor python workers via addPyFile — the
    driver may have started its JVM from any cwd before importing this
    module, in which case workers cannot resolve `import sparkocr` for
    the pandas-UDF closures (pickled by reference). Safe to call per
    query; ships once per application (keyed by applicationId — id(sc)
    could be reused at the same address after a stop/recreate), and the
    zip is built fresh once per process (reusing a pid-named file left
    by a RECYCLED pid would ship stale executor code)."""
    sc = spark.sparkContext
    if sc.applicationId in _SHIPPED:
        return
    import os
    import tempfile
    import zipfile

    global _ZIP_PATH
    if _ZIP_PATH is None:
        here = os.path.dirname(os.path.abspath(__file__))
        zpath = os.path.join(tempfile.gettempdir(),
                             f"sparkocr_pyfiles_{os.getpid()}.zip")
        with zipfile.ZipFile(zpath, "w") as z:
            pkg = os.path.join(here, "sparkocr")
            for fn in sorted(os.listdir(pkg)):
                if fn.endswith(".py"):
                    z.write(os.path.join(pkg, fn), f"sparkocr/{fn}")
        _ZIP_PATH = zpath
    sc.addPyFile(_ZIP_PATH)
    _SHIPPED.add(sc.applicationId)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _query_vec(emb: DataFrame, vec_id: int) -> list[float]:
    """Fetch one embedding as the ANN query vector, failing loudly if the
    id is absent (``head()[0]`` on an empty result raises a bare
    TypeError that masquerades as an engine bug)."""
    from pyspark.sql import functions as _F

    row = emb.where(_F.col("vec_id") == vec_id).select("embedding").head()
    if row is None:
        raise ValueError(
            f"query vector vec_id={vec_id} not present in the embeddings "
            "table — the ANN driver queries need it as the probe")
    return list(row[0])


def _as_transcripts(docs: DataFrame) -> DataFrame:
    """documents → the transcript input shape (one doc = one turn; convs
    keyed by source). The small test parquet arrives as ONE scan split,
    which would serialize the extraction UDF on a single core — the
    round-robin repartition is the same rebalance a salted repartition
    performs on a skewed production scan. The gating policy lives in ONE
    place — ``sparkocr.analysis.spread_small_scan``."""
    from sparkocr.analysis import spread_small_scan

    return spread_small_scan(docs.select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        "text",
    ))


# ---------------------------------------------------------------------------
# flagship

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full detect→recognize extraction over sf0.001, ordered
    output with per-turn blocks + full_text."""
    _ensure_pkg(spark)
    from sparkocr.engine import SparkOcrEngine, ordered

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    eng = SparkOcrEngine(spark)
    out = eng.extract(_as_transcripts(docs))
    return ordered(out).select(
        "conv_id", "turn_idx", "n_blocks", "full_text"
    )


# ---------------------------------------------------------------------------
# queries

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sparkocr.analysis import (
        contamination_counts,
        exact_dedup_groups,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        pii_scrub,
        repetition_ratio,
        simhash64,
        with_fingerprint,
        with_lang_id,
        with_quality,
    )
    from sparkocr.ann import cosine_neardup_pairs, cosine_topk, lsh_topk
    from sparkocr.engine import SparkOcrEngine, explode_blocks, ordered
    from sparkocr.layout import assemble_documents, parse_layout
    from sparkocr.multimodal import (
        MEDIA_SCHEMA,
        image_features,
        media_rows,
        sample_frames,
    )

    # Five queries consume the IDENTICAL default-config extraction of
    # the documents table (extract_documents, extract_blocks_flat,
    # extract_quality_metrics, clean_corpus_pipeline, corpus_build_v2).
    # Running the fused pipeline once per query multiplied the driver's
    # correctness wall time ~5× and starved the tail of its budget
    # (round-2 finding), so the extraction is computed ONCE per
    # (SparkContext, sf) and localCheckpoint-shared across them. The
    # memo lives inside this queries() call: the driver (and the local
    # mirror) call queries() once and iterate. Benchmarks MUST disable
    # it (SPARKOCR_EXTRACT_MEMO=0, set by bench.py) — a best-of-N timing
    # loop over a memoized plan would measure the cache, not the engine.
    _extract_memo: dict = {}
    _memo_on = _os.environ.get("SPARKOCR_EXTRACT_MEMO", "1") != "0"

    def _shared_extract(spark, sf):
        key = (id(spark.sparkContext), sf)
        if not _memo_on:
            eng = SparkOcrEngine(spark)
            return eng.extract(_as_transcripts(_t(spark, sf, "documents")))
        if key not in _extract_memo:
            eng = SparkOcrEngine(spark)
            out = eng.extract(_as_transcripts(_t(spark, sf, "documents")))
            _extract_memo[key] = out.localCheckpoint(eager=True)
        return _extract_memo[key]

    # -- relational operators (SQL-oracle-checked) --------------------------
    # single-operator probes are merged into multi-column queries where
    # the operators share a scan — each operator's output columns remain
    # individually hash-verified, and the merge keeps the whole contract
    # inside the driver's ~50-query budget

    def q_window_funcs_events(spark, sf):
        # window functions: row_number (rank) + lag (delta) over one
        # (user_id, ts) window — one shuffle serves both operators
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return (
            _t(spark, sf, "events")
            .select(
                "user_id", "event_id",
                F.row_number().over(w).cast("long").alias("rnk"),
                F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
            )
        )

    def q_lineitem_agg_stats(spark, sf):
        # aggregation family over one groupBy: min/max/count/avg (D5
        # bbox-extent and R8 mean-confidence analogs) share the shuffle
        return (
            _t(spark, sf, "lineitem")
            .groupBy("l_orderkey")
            .agg(
                F.min("l_quantity").alias("q_min"),
                F.max("l_quantity").alias("q_max"),
                F.count("*").alias("n_items"),
                F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            )
        )

    def q_size_clamp_part(spark, sf):
        # D5 min-size filter (pushed to the scan) + D6 clamp arithmetic
        # in one projection
        return (
            _t(spark, sf, "part")
            .where(F.col("p_size") > 5)
            .select(
                "p_partkey", "p_size",
                F.greatest(F.least(F.col("p_size") + 10, F.lit(50)), F.lit(0))
                .alias("clamped"),
            )
        )

    def q_interval_merge_events(spark, sf):
        _t(spark, sf, "events").createOrReplaceTempView("events")
        return spark.sql(_INTERVAL_MERGE_SQL)

    def q_topk_documents(spark, sf):
        return (
            _t(spark, sf, "documents")
            .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
            .select("doc_id", "n_chars")
            .limit(20)
        )

    def q_posexplode_bigram_documents(spark, sf):
        # merged round 4: the posexplode probe + the P2 positional
        # equi-join in one result — a LEFT join keeps every (pos, tok)
        # row (the old posexplode_documents rows, verbatim) while
        # tok_next carries the successor join (the old
        # bigram_zip_join_documents rows; NULL on each doc's last token)
        toks = (
            _t(spark, sf, "documents")
            .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
        )
        a, b = toks.alias("a"), toks.alias("b")
        return (
            a.join(
                b,
                (F.col("a.doc_id") == F.col("b.doc_id"))
                & (F.col("a.pos") + 1 == F.col("b.pos")),
                "left",
            )
            .select(
                F.col("a.doc_id").alias("doc_id"),
                F.col("a.pos").cast("long").alias("pos"),
                F.col("a.tok").alias("tok"),
                F.col("b.tok").alias("tok_next"),
            )
        )

    def q_events_type_stats(spark, sf):
        return (
            _t(spark, sf, "events")
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.round(F.min("value"), 4).alias("v_min"),
                F.round(F.max("value"), 4).alias("v_max"),
            )
        )

    # -- training-data ops (SQL-oracle-checked) ------------------------------

    def q_doc_metrics_documents(spark, sf):
        # per-document text-analysis battery in ONE pass over the scan:
        # whitespace token count, quality features (stopword/punct
        # counts + stop ratio), language-ID, fingerprint, BPE-ish piece
        # count, and the Gopher repetition signal. Every metric is an
        # independent operator (sparkocr.analysis) whose column is
        # individually hash-verified; merging them shares the corpus
        # scan — exactly how a production quality pass runs, and it
        # keeps the driver contract inside its query budget. Only the
        # repetition signal needs a shuffle (explode + two partial
        # aggs); everything else is codegen'd projection.
        from sparkocr.analysis import with_bpe_token_count

        docs = _t(spark, sf, "documents")
        base = with_bpe_token_count(
            with_fingerprint(with_lang_id(with_quality(docs)))
        ).select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_stop").cast("long").alias("n_stop"),
            F.col("n_punct").cast("long").alias("n_punct"),
            "stop_ratio",
            "lang_guess",
            "fingerprint",
            "n_bpe_tokens",
        )
        rep = repetition_ratio(docs, "doc_id").select(
            F.col("doc").alias("doc_id"), "top_tok_n", "rep_ratio")
        # merged round 4: the pretraining quality-gate verdict
        # (stopword-ratio band + token floor — the retired
        # quality_filter_documents probe) rides the same scan as a
        # 0/1 column
        return base.join(rep, "doc_id").withColumn(
            "passes_quality",
            ((F.col("stop_ratio") >= 0.05) & (F.col("stop_ratio") <= 0.6)
             & (F.col("n_tokens") >= 20)).cast("long"),
        )

    def q_exact_dedup_documents(spark, sf):
        docs = _t(spark, sf, "documents")
        dup = docs.orderBy("doc_id").limit(50).withColumn(
            "doc_id", F.col("doc_id") + 1000000
        )
        return exact_dedup_groups(docs.unionByName(dup), "doc_id").select(
            "fingerprint", "n_dups", "keeper"
        )

    def q_neardup_components_documents(spark, sf):
        # cluster the (oracled) jaccard near-dup pairs into components
        # and pick keepers — the tail end of the fuzzy-dedup pipeline
        from sparkocr.analysis import dedup_keepers

        pairs = ngram_jaccard_pairs(
            _t(spark, sf, "documents"), "doc_id", n=2, threshold=0.2)
        return dedup_keepers(pairs).select("component", "keeper",
                                           "n_members")

    def q_probe_url_counts_documents(spark, sf):
        # merged round 4: the contamination substring probe + the URL
        # provenance report as one tagged (kind, key, n) union — both
        # corpus-count probes over one table, both SQL-oracled. The
        # corpus carries no URLs, so a deterministic set is planted
        # (mirrored verbatim in the oracle SQL).
        from sparkocr.analysis import url_domain_counts

        docs = _t(spark, sf, "documents").select("doc_id", "text")
        planted = docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit("see https://site"),
                         (F.col("doc_id") % 5).cast("string"),
                         F.lit(".example.com/page?x=1 "), F.col("text")),
            ).otherwise(F.col("text")),
        )
        probes = contamination_counts(
            docs, ["spark", "customer line", "vector", "zzz-not-present"],
        ).select(F.lit("contains_probe").alias("kind"),
                 F.col("probe").alias("key"), F.col("n_docs").alias("n"))
        domains = url_domain_counts(planted).select(
            F.lit("url_domain").alias("kind"),
            F.col("domain").alias("key"), F.col("n_urls").alias("n"))
        return probes.unionByName(domains)

    def q_strip_boilerplate_documents(spark, sf):
        # plant a repeated banner line on every third doc; the op must
        # strip exactly that line corpus-wide and keep everything else
        from sparkocr.analysis import strip_boilerplate_lines

        docs = _t(spark, sf, "documents").select("doc_id", "text")
        planted = docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit("COOKIE BANNER PLEASE ACCEPT TERMS\n"),
                         F.col("text")),
            ).otherwise(F.col("text")),
        )
        return strip_boilerplate_lines(planted, "doc_id").select(
            "doc", "clean_text", "n_lines_kept")

    def q_length_percentiles_documents(spark, sf):
        from sparkocr.analysis import length_percentiles

        return length_percentiles(_t(spark, sf, "documents")).select(
            "source", "n", "p50", "p90", "p99", "v_max")

    def q_sample_split_documents(spark, sf):
        # merged round 4: the deterministic per-source md5 sample + the
        # reproducible hash split as one per-row result — each sampled
        # row carries its split label, both operators' columns verified.
        # split_n_full is the FULL-corpus count of the row's
        # (source, split) bucket, so the gate still covers every row's
        # split assignment (not just the 10 sampled per source): a
        # threshold regression on any unsampled doc_id moves a bucket
        # count and fails the hash. The counts table is sources x 3
        # rows -> auto-broadcast; the full corpus is scanned once more
        # but only (source, split) ever shuffles.
        from sparkocr.analysis import hash_split, stratified_sample

        docs = _t(spark, sf, "documents")
        counts = (
            hash_split(docs).groupBy("source", "split")
            .agg(F.count("*").alias("split_n_full"))
        )
        sampled = hash_split(stratified_sample(docs, k=10)).select(
            "source", "doc_id", "split")
        return sampled.join(counts, ["source", "split"]).select(
            "source", "doc_id", "split", "split_n_full")

    def q_ivf_topk_embeddings(spark, sf):
        from sparkocr.ann import ivf_topk

        emb = _t(spark, sf, "embeddings")
        qv = _query_vec(emb, 0)
        return ivf_topk(emb, qv, dim=len(qv), k=10, nlist=16, nprobe=4)

    def q_pii_scrub_documents(spark, sf):
        # the corpus carries no PII, so plant 40 rows with a synthetic
        # email + phone prefix (mirrored verbatim in the oracle SQL)
        docs = _t(spark, sf, "documents").select("doc_id", "text")
        planted = (
            docs.orderBy("doc_id").limit(40)
            .withColumn("doc_id", F.col("doc_id") + 3000000)
            .withColumn(
                "text",
                F.concat(F.lit("contact alice"),
                         F.col("doc_id").cast("string"),
                         F.lit("@example.com or +1-555-010-1234 "),
                         F.col("text")),
            )
        )
        return pii_scrub(docs.unionByName(planted)).select(
            "doc_id", "n_emails", "n_phones",
            F.length("scrubbed").cast("long").alias("scrubbed_len"))

    def q_jaccard_pairs_documents(spark, sf):
        return ngram_jaccard_pairs(
            _t(spark, sf, "documents"), "doc_id", n=2, threshold=0.2
        )

    def q_embed_topk_neardup_exact(spark, sf):
        # merged round 4: exact brute-force cosine top-k + exact
        # near-dup pairs as one tagged union (same scan family, both
        # SQL-oracled). Near-dup threshold tuned to the synthetic
        # embeddings (near-random: max pairwise cosine ≈ 0.51) so the
        # result is non-trivial.
        # Round-5 scale fix: the exact-pairs arm is an all-pairs cross
        # join BY DESIGN (the labeled oracle for the LSH path) and went
        # quadratic exactly where the sf1 slope run predicted — 20k
        # vectors = 200M scored pairs, ~an hour on 8 cores. A recall
        # oracle never needs the whole corpus: bound it to a FIXED
        # deterministic sample (vec_id < 2000 — the full table at the
        # sf0.01 gate, so the pin is unchanged; constant cost at any
        # larger sf). The top-k arm stays full-corpus (linear).
        emb = _t(spark, sf, "embeddings")
        topk = cosine_topk(emb, _query_vec(emb, 0), k=10).select(
            F.lit("topk").alias("kind"),
            F.lit(0).cast("long").alias("id_a"),
            F.col("vec_id").cast("long").alias("id_b"),
            F.col("cosine").alias("score"),
        )
        pairs = cosine_neardup_pairs(
            emb.where(F.col("vec_id") < 2000), threshold=0.38
        ).select(
            F.lit("neardup").alias("kind"),
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
            F.col("cosine").alias("score"),
        )
        return topk.unionByName(pairs)

    # -- relational joins / grouping (SQL-oracle-checked) --------------------

    def q_broadcast_join_orders(spark, sf):
        orders = _t(spark, sf, "orders")
        cust = _t(spark, sf, "customer")
        return (
            orders.join(F.broadcast(cust),
                        orders.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        )

    def q_semi_anti_customer(spark, sf):
        # left_semi + left_anti in one result, tagged: customers with
        # any order, and customers with no LARGE order (every customer
        # has SOME order in this data, so the unfiltered anti-join would
        # be empty — the filter keeps the anti side non-trivial)
        cust = _t(spark, sf, "customer")
        orders = _t(spark, sf, "orders")
        semi = (
            cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
            .select("c_custkey", F.lit("has_order").alias("tag"))
        )
        big = orders.where(F.col("o_totalprice") > 400000)
        anti = (
            cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
            .select("c_custkey", F.lit("no_big_order").alias("tag"))
        )
        return semi.unionByName(anti)

    def q_rollup_cube_sales(spark, sf):
        # merged round 5 (frees contract slots for the streaming ledger
        # and the sampling/chunking rows): the long-green rollup_orders,
        # cube_lineitem, and orders_by_month probes as ONE tagged union —
        # same multi-column merge pattern as round 4; each operator's
        # rows stay individually hash-verified under its src tag.
        rollup = (
            _t(spark, sf, "orders")
            .rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n"))
            .select(F.lit("rollup_orders").alias("src"),
                    F.col("o_orderstatus").alias("k1"),
                    F.col("o_orderpriority").alias("k2"),
                    "n", F.lit(None).cast("double").alias("agg_val"))
        )
        cube = (
            _t(spark, sf, "lineitem")
            .cube("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
            .select(F.lit("cube_lineitem").alias("src"),
                    F.col("l_returnflag").alias("k1"),
                    F.col("l_linestatus").alias("k2"),
                    "n", F.col("sum_qty").alias("agg_val"))
        )
        monthly = (
            _t(spark, sf, "orders")
            .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total_price"))
            .select(F.lit("orders_by_month").alias("src"),
                    F.col("month").alias("k1"),
                    F.lit(None).cast("string").alias("k2"),
                    "n", F.col("total_price").alias("agg_val"))
        )
        return rollup.unionByName(cube).unionByName(monthly)

    def q_asof_join_events(spark, sf):
        from sparkocr.relational import asof_join

        ev = _t(spark, sf, "events")
        purchases = ev.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts")
        clicks = ev.where(F.col("event_type") == "click")
        return (
            asof_join(purchases, clicks, on="ts", by="user_id",
                      right_cols=("value",), tiebreak="event_id")
            .select("event_id", "user_id",
                    F.round("value_asof", 4).alias("value_asof"))
        )

    def q_interval_join_events(spark, sf):
        # Round-5 scale fix (sf1 mirror finding): the events value range
        # is FIXED, so interval density grows with sf and the pair
        # OUTPUT grows quadratically — 21k pairs at sf0.01, 131.7M at
        # sf1. The operator itself is output-bounded (banded equi-join,
        # cost ∝ pairs — the honest lower bound for "emit all
        # overlapping pairs"); it is the PROBE that must stay
        # fixed-size: bound the input to event_id < 20000, a superset
        # of the whole sf0.01 table, so the gate hash is unchanged and
        # the probe's density is sf-invariant.
        from sparkocr.relational import interval_overlap_join

        iv = (
            _t(spark, sf, "events")
            .where((F.col("event_type") == "error")
                   & (F.col("event_id") < 20000))
            .select(
                F.col("event_id").alias("k"),
                F.floor(F.col("value") * 100).cast("long").alias("start"),
                (F.floor(F.col("value") * 100) + 50).cast("long").alias("end"),
            )
        )
        return interval_overlap_join(iv, "k", threshold=2, band=64)

    def q_sessionize_events(spark, sf):
        from sparkocr.relational import sessionize

        ev = sessionize(_t(spark, sf, "events"), by="user_id",
                        ts_col="ts", gap_seconds=1800,
                        order_tiebreak="event_id")
        return (
            ev.groupBy("user_id", "session_id")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.min("event_id").alias("first_event"))
        )

    def q_except_nations(spark, sf):
        cust = _t(spark, sf, "customer").where(F.col("c_acctbal") > 9000) \
            .select(F.col("c_nationkey").alias("nationkey")).distinct()
        supp = _t(spark, sf, "supplier").where(F.col("s_acctbal") > 9000) \
            .select(F.col("s_nationkey").alias("nationkey")).distinct()
        return cust.subtract(supp)

    # -- layout / document parsing -------------------------------------------

    def q_doc_pages_documents(spark, sf):
        payloads = assemble_documents(_t(spark, sf, "documents"),
                                      "doc_id", "text", pages_per_doc=3)
        return (
            payloads.select(
                "pdoc_id",
                F.posexplode(F.split("payload", "\f")).alias("page_no", "page"),
            )
            .select("pdoc_id", F.col("page_no").cast("long").alias("page_no"),
                    F.length("page").cast("long").alias("n_chars"))
        )

    def q_layout_regions_documents(spark, sf):
        payloads = assemble_documents(_t(spark, sf, "documents"),
                                      "doc_id", "text", pages_per_doc=3)
        parsed = parse_layout(payloads.select(F.col("pdoc_id"),
                                              F.col("payload").alias("text")),
                              passthrough=("pdoc_id",))
        return (
            parsed.select("pdoc_id", F.explode("regions").alias("r"))
            .select("pdoc_id", "r.page", "r.pos", "r.region_type",
                    "r.start", "r.end")
        )

    def q_extract_route_documents(spark, sf):
        # tool turns carrying multi-page payloads take the layout path,
        # plain turns the standard path — one fused stage for both
        payloads = assemble_documents(_t(spark, sf, "documents"),
                                      "doc_id", "text", pages_per_doc=5)
        mixed = payloads.select(
            F.lit("docs").alias("conv_id"),
            F.col("pdoc_id").cast("int").alias("turn_idx"),
            F.lit("tool").alias("role"),
            F.col("payload").alias("text"),
        )
        eng = SparkOcrEngine(spark)
        out = eng.extract(mixed, route_documents=True)
        return ordered(out).select("conv_id", "turn_idx", "n_blocks", "full_text")

    # -- multimodal (deterministic fake codec; plumbing is the subject) ------

    def q_media_image_features(spark, sf):
        media = spark.createDataFrame(media_rows(120), MEDIA_SCHEMA)
        out = image_features(media.where(F.col("kind") == "image"))
        return out.select(
            "media_id",
            F.round(F.element_at("features", 1), 2).alias("mean_px"),
            F.size("features").alias("n_features"),
            "decode_error",
        )

    def q_media_video_frames(spark, sf):
        media = spark.createDataFrame(media_rows(120), MEDIA_SCHEMA)
        out = sample_frames(media, every_n=2)
        return out.select("media_id", "frame_idx",
                          F.length("frame").alias("frame_bytes"))

    def q_clean_corpus_pipeline(spark, sf):
        # the end-to-end training-corpus shape: extract → drop empty →
        # quality gate → exact-dedup keepers → per-source counts. One
        # composed DataFrame plan; every stage is an operator tested
        # above (rows-only: extraction output feeds the SQL-free side).
        extracted = _shared_extract(spark, sf)
        clean = (
            extracted.where(F.col("n_blocks") > 0)
            .select("conv_id", "turn_idx",
                    F.col("full_text").alias("text"))
        )
        gated = with_quality(clean).where(F.col("n_tokens") >= 10)
        keepers = exact_dedup_groups(
            gated.withColumn("doc_key",
                             F.concat_ws("#", "conv_id", "turn_idx")),
            "doc_key",
        ).select(F.col("keeper").alias("doc_key"))
        kept = gated.withColumn(
            "doc_key", F.concat_ws("#", "conv_id", "turn_idx")
        ).join(keepers, "doc_key", "left_semi")
        return (
            kept.groupBy("conv_id")
            .agg(F.count("*").alias("n_kept"),
                 F.sum("n_tokens").alias("n_tokens"))
        )

    def q_corpus_build_v2(spark, sf):
        # the FULL training-corpus build, end to end, composing this
        # round's operators: extract → strip cross-corpus boilerplate
        # lines → quality gate → near-dup pairs → connected components
        # → keep one doc per cluster → deterministic train/val/test
        # split → per-split corpus stats. One driver query exercising
        # the whole chain; every stage is individually oracled above.
        from sparkocr.analysis import (
            hash_split,
            neardup_components,
            strip_boilerplate_lines,
        )

        extracted = (
            _shared_extract(spark, sf)
            .where(F.col("n_blocks") > 0)
            .select(F.col("turn_idx").cast("long").alias("doc_id"),
                    F.col("full_text").alias("text"))
        )
        stripped = strip_boilerplate_lines(extracted, "doc_id") \
            .select(F.col("doc").alias("doc_id"),
                    F.col("clean_text").alias("text"))
        # gated feeds TWO consumers (the pair build and the final
        # anti-join/split) — materialize once so the extraction +
        # boilerplate reassembly does not execute twice
        gated = with_quality(stripped).where(F.col("n_tokens") >= 10) \
            .select("doc_id", "text").localCheckpoint(eager=True)
        pairs = ngram_jaccard_pairs(gated, "doc_id", n=2, threshold=0.2)
        # every member whose id differs from its component's min id is
        # a near-duplicate of the keeper and is dropped
        comp = neardup_components(pairs)
        losers = comp.where(F.col("node") != F.col("component")) \
            .select(F.col("node").alias("doc_id"))
        kept = gated.join(losers, "doc_id", "left_anti")
        return (
            hash_split(kept)
            .groupBy("split")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(F.length("text")).cast("long").alias("n_chars"))
        )

    def q_checkpointed_extract_ledger(spark, sf):
        # the checkpoint/resume path as a driver-verified query: run the
        # bucketed checkpointed extraction with a simulated mid-run kill
        # (max_batches=1 — equivalent to a real kill between batches,
        # because the ledger write is the commit point), then RESUME the
        # same call to completion, and return the per-bucket ledger
        # metrics. Everything is deterministic (bucket = pmod(xxhash64(
        # conv_id), 16); metrics from the committed parquet), so the
        # result pins as a golden. Wall-time fields are excluded.
        import tempfile

        from sparkocr.checkpoint import done_buckets, run_checkpointed

        docs = _as_transcripts(_t(spark, sf, "documents"))
        with tempfile.TemporaryDirectory() as td:
            first = run_checkpointed(spark, docs, td, input_path=f"{sf}/documents",
                                     n_buckets=16, batch_buckets=4, max_batches=1)
            if len(first["processed"]) != 4 or not first["remaining"]:
                raise RuntimeError(
                    f"partial first run did not behave as scripted: {first}")
            resumed = run_checkpointed(spark, docs, td, input_path=f"{sf}/documents",
                                       n_buckets=16, batch_buckets=4)
            if resumed["remaining"] or sorted(resumed["already_done"]) != sorted(
                    first["processed"]):
                raise RuntimeError(
                    f"resume did not pick up exactly the unfinished buckets: "
                    f"{resumed}")
            if done_buckets(td) != set(range(16)):
                raise RuntimeError("ledger incomplete after resume")
            import json

            entries = []
            for b in sorted(done_buckets(td)):
                with open(f"{td}/_ledger/bucket={b}.json") as f:
                    e = json.load(f)
                entries.append((e["bucket"], e["n_turns"], e["n_blocks"],
                                e["empty_rate"], e["mean_confidence"],
                                e["n_errors"]))
        # the ledger is bounded (n_buckets rows) — a driver-side literal
        # DataFrame, not a data path
        return spark.createDataFrame(
            entries,
            "bucket int, n_turns long, n_blocks long, empty_rate double, "
            "mean_confidence double, n_errors long")

    def q_streaming_extract_ledger(spark, sf):
        # round-5: streaming gets its driver row (round-4 verdict task
        # #3) — the availableNow incremental extract with a MID-RUN
        # RESTART, verified exactly the way checkpointed_extract_ledger
        # verifies the batch path. Script: land half the corpus (conv
        # buckets 0-3) in the source dir, drain it with one availableNow
        # run, land the second half, drain again on the SAME streaming
        # checkpoint. Exactly-once over the restart is what the ledger
        # pins: run 2 must process ONLY the new files (no re-extraction,
        # no duplicates), so each bucket appears once, tagged with the
        # run that committed it, with metrics over all its turns.
        # Deterministic (bucket = pmod(xxhash64(conv_id), 8); metrics
        # from committed parquet) → pins as a golden. Wall time excluded.
        import tempfile

        from sparkocr.streaming import extract_stream

        docs = _as_transcripts(_t(spark, sf, "documents")).select(
            "conv_id", "turn_idx", "role", "text",
            F.lit(None).cast("string").alias("tool"),
            F.lit(None).cast("timestamp").alias("ts"),
        ).withColumn(
            "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(8)).cast("int"))
        bucket_of = F.pmod(F.xxhash64("conv_id"), F.lit(8)).cast("int")
        with tempfile.TemporaryDirectory() as td:
            src, out, ckpt = f"{td}/in", f"{td}/out", f"{td}/ckpt"
            docs.where(F.col("bucket") < 4).drop("bucket") \
                .write.mode("append").parquet(src)
            extract_stream(spark, src, out, ckpt).awaitTermination()
            # expected = the low buckets actually PRESENT in the input
            # (conv_id cardinality can leave a hash bucket empty at
            # small sf) — bounded collect: ≤ 8 rows
            expected1 = {
                int(r["bucket"]) for r in docs.where(F.col("bucket") < 4)
                .select("bucket").distinct().collect()
            }
            first = {
                int(r["bucket"]) for r in spark.read.parquet(out)
                .select(bucket_of.alias("bucket")).distinct().collect()
            }
            if first != expected1:
                raise RuntimeError(
                    f"first availableNow run drained buckets {sorted(first)}, "
                    f"expected exactly {sorted(expected1)}")
            docs.where(F.col("bucket") >= 4).drop("bucket") \
                .write.mode("append").parquet(src)
            extract_stream(spark, src, out, ckpt).awaitTermination()
            committed = spark.read.parquet(out) \
                .withColumn("bucket", bucket_of)
            n_in = docs.count()
            n_out = committed.count()
            if n_out != n_in:
                raise RuntimeError(
                    f"restart broke exactly-once: {n_out} output turns vs "
                    f"{n_in} input (duplicates or loss across the resume)")
            ledger = (
                committed.groupBy("bucket")
                .agg(F.count("*").alias("n_turns"),
                     F.sum("n_blocks").cast("long").alias("n_blocks"),
                     F.round(F.avg(F.when(F.col("n_blocks") == 0, 1.0)
                                   .otherwise(0.0)), 6).alias("empty_rate"),
                     F.round(F.avg(F.expr(
                         "aggregate(blocks, cast(0.0 as double), "
                         "(a, b) -> a + b.confidence)"
                         " / greatest(size(blocks), 1)")), 6)
                     .alias("mean_confidence"),
                     F.sum(F.when(F.col("error_code").isNotNull(), 1)
                           .otherwise(0)).cast("long").alias("n_errors"))
                .withColumn("run", F.when(F.col("bucket") < 4, 1).otherwise(2))
                .select("bucket", "run", "n_turns", "n_blocks",
                        "empty_rate", "mean_confidence", "n_errors")
            )
            rows = ledger.collect()  # bounded: 8 buckets
        return spark.createDataFrame(
            rows,
            "bucket int, run int, n_turns long, n_blocks long, "
            "empty_rate double, mean_confidence double, n_errors long")

    def q_dsir_chunk_documents(spark, sf):
        # round-5 stretch: the last pytest-only deterministic operators
        # get a driver row — DSIR's Gumbel top-k sampler (Xie 2023) and
        # the greedy conversation chunker, as one tagged union (the
        # round-4 merge pattern; each arm's rows hash-verified under its
        # kind tag). The SQL oracle re-derives BOTH from the documents
        # table alone: the sampler's md5-Gumbel keys are
        # engine-reproducible by construction, and the chunker's greedy
        # state machine is a recursive CTE (validated against the
        # kernel on randomized corpora in tests/test_packing.py).
        from sparkocr.analysis import chunk_conversations
        from sparkocr.lm import dsir_sample

        docs = _t(spark, sf, "documents")
        weights = docs.select(
            "doc_id",
            F.round(F.log(F.col("n_chars").cast("double")) - F.lit(5.7),
                    6).alias("log_w"))
        sampled = dsir_sample(weights, k=40).select(
            F.lit("dsir").alias("kind"),
            F.col("doc_id").cast("string").alias("conv"),
            F.lit(None).cast("long").alias("turn"),
            F.lit(None).cast("long").alias("chunk"),
            F.lit(None).cast("int").alias("pos"),
            F.lit(None).cast("long").alias("n_tokens"),
            F.col("gumbel_key").alias("score"),
        )
        turns = docs.select(
            F.col("source").alias("conv_id"),
            F.col("doc_id").alias("turn_idx"),
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
        chunked = chunk_conversations(turns, max_tokens=300).select(
            F.lit("chunk").alias("kind"), "conv", "turn", "chunk",
            "pos", "n_tokens",
            F.lit(None).cast("double").alias("score"),
        )
        return sampled.unionByName(chunked)

    # -- extraction pipeline (rows-only: correctness gate = golden tests) ----

    def q_extract_documents(spark, sf):
        out = _shared_extract(spark, sf)
        return ordered(out).select("conv_id", "turn_idx", "n_blocks", "full_text")

    def q_extract_keys_documents(spark, sf):
        # keys-file parity end-to-end (rec.rs:16,55-59): the reference
        # decodes EVERY image through models/ppocr_keys_v5.txt — this
        # runs the flagship extraction with that exact vocabulary
        # restriction (out-of-vocab chars decode as CTC blanks). The
        # keys file is DATA read from the reference at runtime, not code.
        import os

        from sparkocr.config import FLAGSHIP_CONFIG
        from sparkocr.keys import load_keys_file

        keys_path = "/root/reference/models/ppocr_keys_v5.txt"
        if not os.path.exists(keys_path):
            # fail FAST and loud: the committed oracle pin was built
            # with the full 18k-key vocabulary — a silent fallback
            # vocabulary would hash-mismatch and masquerade as an
            # engine regression (review finding)
            raise FileNotFoundError(
                f"keys file {keys_path} not found — extract_keys_documents "
                "requires the reference checkout; its oracle pin is tied "
                "to that exact vocabulary")
        keys = load_keys_file(keys_path)
        eng = SparkOcrEngine(spark, FLAGSHIP_CONFIG.with_dictionary(keys))
        out = eng.extract(_as_transcripts(_t(spark, sf, "documents")))
        return ordered(out).select("conv_id", "turn_idx", "n_blocks",
                                   "full_text")

    def q_extract_blocks_flat(spark, sf):
        out = _shared_extract(spark, sf)
        return ordered(
            explode_blocks(out.select("conv_id", "turn_idx", "blocks"))
        ).select("conv_id", "turn_idx", "pos", "text", "block_type", "start", "end")

    def q_extract_quality_metrics(spark, sf):
        # per-conversation extraction-quality metrics (the checkpoint
        # manifest metrics): blocks/turn, empty rate, avg confidence
        out = _shared_extract(spark, sf)
        return (
            out.groupBy("conv_id")
            .agg(
                F.count("*").alias("n_turns"),
                F.sum("n_blocks").alias("n_blocks"),
                F.round(F.avg(F.when(F.col("n_blocks") == 0, 1.0).otherwise(0.0)), 4)
                .alias("empty_rate"),
            )
        )

    def q_spans_documents(spark, sf):
        eng = SparkOcrEngine(spark)
        out = eng.spans(_as_transcripts(_t(spark, sf, "documents")))
        return (
            out.select("conv_id", "turn_idx", F.posexplode("boxes").alias("pos", "box"))
            .select("conv_id", "turn_idx", "pos", "box.*")
        )

    def q_minhash_lsh_pairs_documents(spark, sf):
        return minhash_lsh_pairs(_t(spark, sf, "documents"), "doc_id", n_shingle=2)

    def q_simhash_documents(spark, sf):
        return simhash64(_t(spark, sf, "documents"), "doc_id").select("doc_id", "simhash")

    def q_simhash_neardup_documents(spark, sf):
        from sparkocr.analysis import simhash_neardup_pairs

        docs = _t(spark, sf, "documents")
        # plant near-dups: 30 docs replayed with a one-token prefix edit
        dup = (
            docs.orderBy("doc_id").limit(30)
            .withColumn("doc_id", F.col("doc_id") + 2000000)
            .withColumn("text", F.concat(F.lit("copy "), F.col("text")))
        )
        return simhash_neardup_pairs(docs.unionByName(dup), "doc_id",
                                     max_hamming=3)

    def q_lsh_topk_neardup_embeddings(spark, sf):
        # merged round 4: LSH-bucketed top-k + LSH-bucketed near-dup
        # pairs (both pins, same scan family) as one tagged union —
        # each operator's rows stay individually hash-verified.
        # Round 5 adds the THIRD sibling on the same scan: the SemDeDup
        # cluster-pruned near-dup pairs (cluster_neardup_pairs — k-means
        # coarse clusters, cosine pruning within a cluster), promoting
        # the last pytest-only ANN operator into the hard signal. Pin
        # regenerated for the widened union (said in the commit).
        from sparkocr.ann import cluster_neardup_pairs

        emb = _t(spark, sf, "embeddings")
        qv = _query_vec(emb, 0)  # raises on empty/missing id
        dim = len(qv)
        topk = lsh_topk(emb, qv, dim=dim, k=10).select(
            F.lit("topk").alias("kind"),
            F.lit(0).cast("long").alias("id_a"),
            F.col("vec_id").cast("long").alias("id_b"),
            F.col("cosine").alias("score"),
        )
        pairs = cosine_neardup_pairs(
            emb, threshold=0.38, dim=dim, n_planes=6
        ).select(
            F.lit("neardup").alias("kind"),
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
            F.col("cosine").alias("score"),
        )
        clusters = cluster_neardup_pairs(
            emb, dim=dim, threshold=0.42, nlist=8, iters=2
        ).select(
            F.lit("cluster").alias("kind"),
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
            F.col("cosine").alias("score"),
        )
        return topk.unionByName(pairs).unionByName(clusters)

    # -- round-4 rotation: the LM/corpus operator family enters the
    # -- hard signal (merged multi-column queries; see SURVEY §2.7)

    def q_gopher_c4_documents(spark, sf):
        # The published-gate battery in ONE planted corpus and one
        # result: the full Gopher repetition signals (13 fractions, Rae
        # et al. 2021 Table A1), the repetition GATE, the non-repetition
        # Gopher quality gate, and the C4 line/page filters (Raffel et
        # al. 2020 §2.2). The raw documents are single-line and
        # repetition-free, so deterministic structure is planted
        # (mirroring the pii/boilerplate probes): paragraph breaks every
        # 24 tokens, line breaks every 8, terminal punctuation on even
        # docs, duplicated lines/paragraphs, a stuck 1-gram, a
        # javascript line, lorem-ipsum and curly-brace page flags —
        # every rule family fires on a known doc subset. Gate verdicts
        # joined per doc; violations/reasons arrays joined to strings
        # (the driver's hash canonicalizer is scalar-typed).
        from sparkocr.analysis import (
            c4_line_filters,
            gopher_quality_filter,
            gopher_repetition_filter,
            gopher_repetition_signals,
        )

        d = F.col("doc_id")
        lined = F.regexp_replace(
            F.regexp_replace(F.col("text"), r"((?:\S+ ){24})", "$1\n\n"),
            r"((?:\S+ ){8})", "$1\n")
        prefix = F.concat(
            F.when(d % 4 == 0, F.lit("la la la la la la la la "))
            .otherwise(F.lit("")),
            F.when(d % 11 == 0, F.lit("uses javascript heavily "))
            .otherwise(F.lit("")),
            F.when(d % 13 == 0, F.lit("lorem ipsum ")).otherwise(F.lit("")),
        )
        suffix = F.concat(
            F.when(d % 5 == 0, F.lit(
                "\nrepeated banner line alpha\nrepeated banner line alpha"))
            .otherwise(F.lit("")),
            F.when(d % 9 == 0, F.lit(
                "\n\nshared duplicate paragraph body"
                "\n\nshared duplicate paragraph body"))
            .otherwise(F.lit("")),
            F.when(d % 17 == 0, F.lit(" {x}")).otherwise(F.lit("")),
        )
        body = F.when(d % 2 == 0,
                      F.regexp_replace(lined, r"\n", ".\n")).otherwise(lined)
        planted = _t(spark, sf, "documents").select(
            "doc_id", F.concat(prefix, body, suffix).alias("text"))
        sig = gopher_repetition_signals(planted, "doc_id")
        rep = gopher_repetition_filter(planted, "doc_id").select(
            "doc",
            F.col("passes").cast("long").alias("rep_passes"),
            F.array_join("violations", ",").alias("rep_violations"),
        )
        # min_stop_words=0: the synthetic corpus has one English stop
        # word, so the default ≥2-of-8 rule would fail every doc and
        # erase the other rules' signal (the documented non-English knob)
        qual = gopher_quality_filter(
            planted, "doc_id", min_stop_words=0
        ).select(
            "doc",
            F.col("passes").cast("long").alias("q_passes"),
            F.array_join("violations", ",").alias("q_violations"),
        )
        c4 = c4_line_filters(planted, "doc_id").select(
            "doc",
            F.col("n_lines_kept").alias("c4_lines_kept"),
            F.length("clean_text").cast("long").alias("c4_clean_len"),
            F.col("dropped").cast("long").alias("c4_dropped"),
            F.array_join("drop_reasons", ",").alias("c4_drop_reasons"),
        )
        return (
            sig.join(rep, "doc").join(qual, "doc").join(c4, "doc")
            .withColumnRenamed("doc", "doc_id")
        )

    def q_dedup_battery_documents(spark, sf):
        # The corpus-rewriting dedup family in one planted corpus:
        # ExactSubstr token-window dedup (Lee et al. 2021), paragraph
        # first-occurrence dedup, and 13-gram benchmark decontamination
        # (GPT-3 appendix C) — a 25-token passage planted on every 10th
        # doc (duplicated windows; also the decontamination probe) and
        # a shared paragraph on every 7th. Per doc: tokens removed +
        # surviving length (substr), paragraphs kept + surviving length
        # (para), hit windows / probes hit (decontamination; 0 = clean).
        from sparkocr.analysis import (
            dedup_paragraphs,
            dedup_substrings,
            ngram_contamination,
        )

        d = F.col("doc_id")
        planted = _t(spark, sf, "documents").select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.when(d % 10 == 0, F.lit(" " + _DEDUP_PASSAGE))
                .otherwise(F.lit("")),
                F.when(d % 7 == 0, F.lit("\n\n" + _DEDUP_PARA))
                .otherwise(F.lit("")),
            ).alias("text"),
        )
        ss = dedup_substrings(planted, "doc_id", min_len=20).select(
            "doc",
            F.col("n_tokens_removed").alias("substr_tokens_removed"),
            F.length("clean_text").cast("long").alias("substr_clean_len"),
        )
        pp = dedup_paragraphs(planted, "doc_id").select(
            "doc",
            F.col("n_paras_kept").alias("paras_kept"),
            F.length("clean_text").cast("long").alias("para_clean_len"),
        )
        cont = ngram_contamination(
            planted, [_DEDUP_PASSAGE], "doc_id", n=13)
        return (
            ss.join(pp, "doc")
            .join(cont, "doc", "left")
            .select(
                F.col("doc").alias("doc_id"),
                "substr_tokens_removed", "substr_clean_len",
                "paras_kept", "para_clean_len",
                F.coalesce("n_hit_windows", F.lit(0)).cast("long")
                .alias("n_hit_windows"),
                F.coalesce("n_probes_hit", F.lit(0)).cast("long")
                .alias("n_probes_hit"),
            )
        )

    def q_lm_ppl_documents(spark, sf):
        # CCNet-style perplexity quality scoring end to end, against a
        # REAL SQL oracle: add-alpha unigram LM trained on the corpus
        # itself, per-doc perplexity, and the head/middle/tail
        # percentile bucket split (Wenzek et al. 2020) — the DuckDB side
        # re-derives the LM, the scores, and the quantile cuts from
        # scratch (bit-exact at sf0.01/0.001, verified)
        from sparkocr.lm import (perplexity_scores, ppl_buckets,
                                 train_unigram_lm)

        docs = _t(spark, sf, "documents")
        lm = train_unigram_lm(docs)
        scored = perplexity_scores(docs, lm)
        return ppl_buckets(scored).select(
            "doc_id", "ppl",
            F.col("n_scored").cast("long").alias("n_scored"),
            "ppl_bucket",
        )

    def q_lm_model_scores_documents(spark, sf):
        # the trained-model scoring family in one result: DSIR log
        # importance weights (Xie et al. 2023; target = the src0-3
        # slice), the fastText-style quality classifier score (GPT-3
        # recipe; deterministic content-derived labels), and the BPE
        # token-id count under a corpus-trained tokenizer (Sennrich
        # 2016). All seedless/deterministic, so the sf0.01 result pins.
        # Latency shape (r4 note, r5 measured): training IN the query
        # (60 BPE merge rounds + bounded GD iterations, each one corpus
        # pass) is LINEAR in corpus size with a large constant — the
        # sf0.1→sf2 ladder reads alpha 0.92 at 12.8→90.4 s
        # (SCALING_NOTES "scale slopes"). Fine at the sf0.01 gate; at
        # production scale train once offline and pass the artifacts in
        # (lm.vocab_to_keys_bytes bridges them to the engine).
        from sparkocr.lm import (bpe_encode_ids, bpe_vocab, dsir_weights,
                                 quality_scores, train_bpe,
                                 train_quality_classifier)

        docs = _t(spark, sf, "documents").select("doc_id", "source", "text")
        target = docs.where(
            F.col("source").isin("src0", "src1", "src2", "src3"))
        w = dsir_weights(docs, target, n_buckets=2048).select(
            "doc_id",
            F.col("log_w").alias("dsir_log_w"),
            F.col("n_feats").cast("long").alias("dsir_n_feats"),
        )
        model = train_quality_classifier(
            docs.where(F.instr("text", "spark") > 0).select("text"),
            docs.where(F.instr("text", "spark") == 0).select("text"),
            n_buckets=512, n_iters=6)
        q = quality_scores(docs, model).select(
            "doc_id", "quality",
            F.col("n_feats").cast("long").alias("quality_n_feats"))
        merges = train_bpe(docs, num_merges=60)
        vocab = bpe_vocab(docs, merges)
        ids = bpe_encode_ids(docs, merges, vocab).select(
            "doc_id", F.size("bpe_ids").cast("long").alias("n_bpe_ids"))
        return w.join(q, "doc_id").join(ids, "doc_id")

    def q_mix_pack_documents(spark, sf):
        # token-budget mixture draw + greedy next-fit sequence packing —
        # the tail of the pretraining pipeline on (id, source, n_tokens)
        # rows only; text never enters either operator
        from sparkocr.analysis import (mix_corpus, pack_sequences,
                                       with_token_count)

        docs = with_token_count(_t(spark, sf, "documents")).select(
            "doc_id", "source", F.col("n_tokens").cast("long").alias("n_tokens"))
        mixed = mix_corpus(
            docs, {f"src{i}": 1.0 for i in range(5)}, total_tokens=6000)
        packed = pack_sequences(mixed, max_tokens=512, n_shards=2)
        return packed.select(
            "group", "shard", "bin", "pos",
            F.col("id").cast("long").alias("doc_id"),
            "n_tokens", "oversize",
        )

    def q_corpus_funnels(spark, sf):
        # BOTH composed builds, full published gate trio on, as one
        # tagged per-stage retention funnel: build_training_corpus with
        # heuristic + Gopher + trained-classifier + perplexity gates,
        # decontamination, mixture, and build_sft_corpus with
        # conversation dedup + decontamination + budget windows. The
        # pretrain corpus carries 40 planted junk docs (stopword-laced
        # gibberish that passes the heuristic band) so the classifier
        # and perplexity gates do visible work; every stage count is
        # deterministic and pins as a golden.
        from sparkocr.corpus import build_sft_corpus, build_training_corpus
        from sparkocr.lm import train_quality_classifier

        docs = _t(spark, sf, "documents").select("doc_id", "source", "text")
        junk_rows = [
            (900000 + i, "junk",
             " ".join(f"the zx{i}w{j} of qy{i}w{j} and" for j in range(8))
             + " tail")
            for i in range(40)
        ]
        junk = spark.createDataFrame(
            junk_rows, "doc_id long, source string, text string")
        corpus = docs.unionByName(junk)
        model = train_quality_classifier(
            docs.where(F.col("doc_id") < 100).select("text"),
            junk.select("text"),
            n_buckets=1024, n_iters=6)
        pre = build_training_corpus(
            corpus,
            decontamination_probes=[_DECON_PROBE],
            mixture_weights={f"src{i}": 1.0 for i in range(10)},
            total_tokens=10000,
            gopher_gate=True,
            quality_model=model, min_quality_score=0.703,
            max_ppl=33.0,
            boiler_min_df=10, substr_min_len=20,
            with_funnel=True,
        )["funnel"].select(F.lit("pretrain").alias("build"),
                           "stage_idx", "stage", "n", "unit")
        turns = docs.select(
            F.col("source").alias("conv_id"),
            F.col("doc_id").cast("int").alias("turn_idx"),
            F.when(F.col("doc_id") % 2 == 0, "user")
            .otherwise("assistant").alias("role"),
            "text",
        )
        sft = build_sft_corpus(
            turns, budget_tokens=256,
            decontamination_probes=[_DECON_PROBE],
            with_funnel=True,
        )["funnel"].select(F.lit("sft").alias("build"),
                           "stage_idx", "stage", "n", "unit")
        return pre.unionByName(sft)

    def _wrap(fn):
        def g(spark, sf):
            _ensure_pkg(spark)
            return fn(spark, sf)

        return g

    # ORDER IS THE COVERAGE POLICY: the driver runs queries in dict
    # order under a ~50-query budget, so the least-driver-verified
    # queries come FIRST — (a) the round-5 rotation: streaming's first
    # driver row, the sampling/chunking stretch row, and the round-5
    # merges (rollup+cube+monthly as one tagged union; the cluster-
    # neardup arm added to the embeddings union), (b) the round-4
    # rotation (LM/corpus family), (c) long-green queries close the
    # dict; any truncation drops only rows that were green in a prior
    # round and remain pytest-gated.
    return {k: _wrap(v) for k, v in {
        # (a) new/changed this round
        "streaming_extract_ledger": q_streaming_extract_ledger,
        "dsir_chunk_documents": q_dsir_chunk_documents,
        "rollup_cube_sales": q_rollup_cube_sales,
        # (b) round-4 rotation — the LM/corpus family's hard signal
        "gopher_c4_documents": q_gopher_c4_documents,
        "dedup_battery_documents": q_dedup_battery_documents,
        "lm_ppl_documents": q_lm_ppl_documents,
        "lm_model_scores_documents": q_lm_model_scores_documents,
        "mix_pack_documents": q_mix_pack_documents,
        "corpus_funnels": q_corpus_funnels,
        # (b) merged/changed this round
        "posexplode_bigram_documents": q_posexplode_bigram_documents,
        "embed_topk_neardup_exact": q_embed_topk_neardup_exact,
        "probe_url_counts_documents": q_probe_url_counts_documents,
        "sample_split_documents": q_sample_split_documents,
        "lsh_topk_neardup_embeddings": q_lsh_topk_neardup_embeddings,
        "doc_metrics_documents": q_doc_metrics_documents,
        # (c) previously green (round-3/4 artifacts, hash-verified)
        "layout_regions_documents": q_layout_regions_documents,
        "extract_route_documents": q_extract_route_documents,
        "media_image_features": q_media_image_features,
        "media_video_frames": q_media_video_frames,
        "clean_corpus_pipeline": q_clean_corpus_pipeline,
        "corpus_build_v2": q_corpus_build_v2,
        "sessionize_events": q_sessionize_events,
        "checkpointed_extract_ledger": q_checkpointed_extract_ledger,
        "window_funcs_events": q_window_funcs_events,
        "lineitem_agg_stats": q_lineitem_agg_stats,
        "size_clamp_part": q_size_clamp_part,
        "semi_anti_customer": q_semi_anti_customer,
        "interval_merge_events": q_interval_merge_events,
        "topk_documents": q_topk_documents,
        "events_type_stats": q_events_type_stats,
        "exact_dedup_documents": q_exact_dedup_documents,
        "jaccard_pairs_documents": q_jaccard_pairs_documents,
        "neardup_components_documents": q_neardup_components_documents,
        "strip_boilerplate_documents": q_strip_boilerplate_documents,
        "length_percentiles_documents": q_length_percentiles_documents,
        "ivf_topk_embeddings": q_ivf_topk_embeddings,
        "pii_scrub_documents": q_pii_scrub_documents,
        "extract_documents": q_extract_documents,
        "extract_keys_documents": q_extract_keys_documents,
        "extract_blocks_flat": q_extract_blocks_flat,
        "extract_quality_metrics": q_extract_quality_metrics,
        "spans_documents": q_spans_documents,
        "minhash_lsh_pairs_documents": q_minhash_lsh_pairs_documents,
        "simhash_documents": q_simhash_documents,
        "simhash_neardup_documents": q_simhash_neardup_documents,
        "broadcast_join_orders": q_broadcast_join_orders,
        "asof_join_events": q_asof_join_events,
        "interval_join_events": q_interval_join_events,
        "except_nations": q_except_nations,
        "doc_pages_documents": q_doc_pages_documents,
    }.items()}


def bench_probes() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Bench-only probes keeping BENCH/BASELINE.md per-query
    comparability across the round-4 contract merges: the pinned
    baseline times `ann_cosine_topk` and `lsh_topk_embeddings` as
    standalone queries, but the driver contract now verifies that work
    inside the merged `embed_topk_neardup_exact` /
    `lsh_topk_neardup_embeddings` rows. These callables reproduce the
    OLD per-query work exactly (same operators, same parameters) so the
    bench's round-over-round comparison stays apples-to-apples; they
    are NOT part of queries() and carry no oracle."""
    from sparkocr.ann import cosine_topk, lsh_topk

    def ann_cosine_topk(spark, sf):
        _ensure_pkg(spark)
        emb = _t(spark, sf, "embeddings")
        return cosine_topk(emb, _query_vec(emb, 0), k=10)

    def lsh_topk_embeddings(spark, sf):
        _ensure_pkg(spark)
        emb = _t(spark, sf, "embeddings")
        qv = _query_vec(emb, 0)
        return lsh_topk(emb, qv, dim=len(qv), k=10)

    return {"ann_cosine_topk": ann_cosine_topk,
            "lsh_topk_embeddings": lsh_topk_embeddings}


# dedup_battery plants: a 25-token passage (duplicated windows for
# ExactSubstr, and the 13-gram decontamination probe) and a shared
# paragraph; corpus_funnels reuses doc 0's 15-token prefix as its
# decontamination probe (a verbatim literal — reading the table at
# query-definition time would make the probe depend on scan order)
_DEDUP_PASSAGE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega final")
_DEDUP_PARA = "shared paragraph body repeated across documents verbatim"
_DECON_PROBE = ("key agg row scan slow fast table value part hash "
                "value table part a row")


_INTERVAL_MERGE_SQL = """
WITH iv AS (
  SELECT user_id, value AS s, value + 10 AS e FROM events
), w AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM iv
), g AS (
  SELECT user_id,
         sum(CASE WHEN prev_max IS NULL OR s > prev_max + 1 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY s, e
                   ROWS UNBOUNDED PRECEDING) AS grp
  FROM w
)
SELECT user_id, count(DISTINCT grp) AS n_merged FROM g GROUP BY user_id
"""


# Queries whose semantics have no SQL form (detect→recognize cascade,
# banded LSH over process-local hash functions, fake-codec media, layout
# parsing). Their oracle is a COMMITTED GOLDEN: the sf0.01 result pinned
# as a parquet fixture (tests/fixtures/oracle/) that DuckDB re-reads, so
# the driver's rows+schema+hash gate catches any regression. The goldens
# are regression pins, not independent derivations — independent
# validation lives in pytest (hand-authored extraction fixtures in
# tests/test_handwritten_golden.py, the minhash⊇exact-Jaccard superset
# bound, simhash planted-pair recall, media codec unit tests).
# Regenerate deliberately via scripts/make_oracle_goldens.py after any
# intended semantics change, and say so in the commit.
GOLDEN_ORACLE_QUERIES = [
    "streaming_extract_ledger",
    "gopher_c4_documents",
    "dedup_battery_documents",
    "lm_model_scores_documents",
    "mix_pack_documents",
    "corpus_funnels",
    "lsh_topk_neardup_embeddings",
    "extract_documents",
    "extract_keys_documents",
    "extract_blocks_flat",
    "extract_quality_metrics",
    "spans_documents",
    "minhash_lsh_pairs_documents",
    "simhash_documents",
    "simhash_neardup_documents",
    "ivf_topk_embeddings",
    "layout_regions_documents",
    "extract_route_documents",
    "media_image_features",
    "media_video_frames",
    "clean_corpus_pipeline",
    "corpus_build_v2",
    "checkpointed_extract_ledger",
]

_ORACLE_FIXTURE_DIR = None


def _oracle_fixture_dir() -> str:
    global _ORACLE_FIXTURE_DIR
    if _ORACLE_FIXTURE_DIR is None:
        import os

        _ORACLE_FIXTURE_DIR = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "tests", "fixtures", "oracle")
    return _ORACLE_FIXTURE_DIR


# the tokenize→shingle→cap→sizes→common CTE chain is the SHARED
# pair-generation contract of jaccard_pairs_documents AND
# neardup_components_documents — one definition, composed into both SQL
# strings, so the cap/threshold/tokenization can never silently drift
# between them
_JACCARD_CTES = """toks AS (
              SELECT doc_id,
                     generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
                     unnest(string_split(text, ' ')) AS tok
              FROM documents
            ), grams_all AS (
              SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok AS gram
              FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.pos + 1 = b.pos
            ), grams AS MATERIALIZED (
              -- MATERIALIZED: two downstream consumers (sizes, common)
              -- — as a view the tokenize+self-join above runs twice.
              -- stop-shingle guard, same max_df=100 cap as the Spark op
              SELECT g.doc_id, g.gram FROM grams_all g
              JOIN (SELECT gram FROM grams_all GROUP BY gram
                    HAVING count(*) <= 100) keep USING (gram)
            ), sizes AS (
              SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
            ), common AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )"""


def oracle_sql() -> dict[str, str]:
    import os

    stop_list = "'the','and','of','to','a','in','is','it','that','for','on','with','as','at','by','an','be','this','are','or'"
    golden_dir = _oracle_fixture_dir()
    golden = {}
    for name in GOLDEN_ORACLE_QUERIES:
        path = f"{golden_dir}/{name}.parquet"
        if os.path.exists(path):
            golden[name] = f"SELECT * FROM read_parquet('{path}')"
        else:
            # degrade THAT query to rows-only rather than failing every
            # query's oracle run, but never silently: the pytest gate
            # (test_driver_contract.test_every_query_has_an_oracle)
            # fails the build on a missing listed fixture
            import sys

            print(f"WARNING: golden oracle fixture missing: {path} — "
                  f"{name} degrades to rows-only this run; regenerate "
                  "via scripts/make_oracle_goldens.py", file=sys.stderr)
    return golden | {
        "window_funcs_events": """
            SELECT user_id, event_id,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rnk,
                   round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta
            FROM events
        """,
        "lineitem_agg_stats": """
            SELECT l_orderkey, min(l_quantity) AS q_min, max(l_quantity) AS q_max,
                   count(*) AS n_items, round(avg(l_quantity), 6) AS avg_qty
            FROM lineitem GROUP BY l_orderkey
        """,
        "size_clamp_part": """
            SELECT p_partkey, p_size, greatest(least(p_size + 10, 50), 0) AS clamped
            FROM part WHERE p_size > 5
        """,
        "interval_merge_events": _INTERVAL_MERGE_SQL,
        "topk_documents": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id ASC LIMIT 20
        """,
        "posexplode_bigram_documents": """
            WITH toks AS (
              SELECT doc_id,
                     generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
                     unnest(string_split(text, ' ')) AS tok
              FROM documents
            )
            SELECT a.doc_id AS doc_id, a.pos AS pos, a.tok AS tok, b.tok AS tok_next
            FROM toks a LEFT JOIN toks b
              ON a.doc_id = b.doc_id AND a.pos + 1 = b.pos
        """,
        "lm_ppl_documents": r"""
            -- the full CCNet scoring re-derived from scratch: add-0.5
            -- unigram LM over lowercased whitespace tokens (the \x0b/\f
            -- class spelled out via chr() — RE2 string escapes differ),
            -- per-doc perplexity, and interpolated-percentile
            -- head/middle/tail cuts (quantile_cont == Spark percentile)
            WITH toks AS (
              SELECT doc_id, unnest(list_filter(
                       regexp_split_to_array(lower(text),
                         '[ \t\n\r' || chr(12) || chr(11) || ']+'),
                       x -> x <> '')) AS token
              FROM documents
            ), counts AS (
              SELECT token, count(*) AS c FROM toks GROUP BY token
            ), tot AS (
              SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM counts
            ), lp AS (
              SELECT token, ln((c + 0.5) / (n + 0.5 * (v + 1))) AS logprob
              FROM counts, tot
            ), scored AS (
              SELECT d.doc_id,
                     round(exp(-avg(lp.logprob)), 4) AS ppl,
                     CAST(count(t.token) AS BIGINT) AS n_scored
              FROM documents d
              LEFT JOIN toks t ON t.doc_id = d.doc_id
              LEFT JOIN lp ON lp.token = t.token
              GROUP BY d.doc_id
            ), cuts AS (
              SELECT quantile_cont(ppl, 1.0/3) AS c1,
                     quantile_cont(ppl, 2.0/3) AS c2 FROM scored
            )
            SELECT doc_id, ppl, n_scored,
                   CASE WHEN ppl IS NULL THEN NULL
                        WHEN ppl <= c1 THEN 'head'
                        WHEN ppl <= c2 THEN 'middle'
                        ELSE 'tail' END AS ppl_bucket
            FROM scored, cuts
        """,
        "events_type_stats": """
            SELECT event_type, count(*) AS n,
                   round(min(value), 4) AS v_min, round(max(value), 4) AS v_max
            FROM events GROUP BY event_type
        """,
        "doc_metrics_documents": f"""
            WITH rep AS (
              SELECT doc, CAST(max(n) AS BIGINT) AS top_tok_n,
                     round(max(n) * 1.0 / sum(n), 4) AS rep_ratio
              FROM (
                SELECT doc, tok, count(*) AS n FROM (
                  SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS tok
                  FROM documents
                ) GROUP BY doc, tok
              ) GROUP BY doc
            )
            SELECT d.doc_id,
                   len(string_split(d.text, ' ')) AS n_tokens,
                   len(list_filter(string_split(d.text, ' '),
                       x -> x IN ({stop_list}))) AS n_stop,
                   length(d.text) - length(regexp_replace(d.text, '[,.!?;:]', '', 'g')) AS n_punct,
                   round(len(list_filter(string_split(d.text, ' '),
                         x -> x IN ({stop_list}))) * 1.0
                         / greatest(len(string_split(d.text, ' ')), 1), 4) AS stop_ratio,
                   CASE
                     WHEN (length(d.text) - length(regexp_replace(d.text, '[^぀-ヿ]', '', 'g')))
                          * 1.0 / greatest(length(d.text), 1) > 0.05 THEN 'ja'
                     WHEN (length(d.text) - length(regexp_replace(d.text, '[^一-鿿]', '', 'g')))
                          * 1.0 / greatest(length(d.text), 1) > 0.25 THEN 'zh'
                     WHEN (length(d.text) - length(regexp_replace(d.text, '[^가-힯]', '', 'g')))
                          * 1.0 / greatest(length(d.text), 1) > 0.25 THEN 'ko'
                     WHEN (length(d.text) - length(regexp_replace(d.text, '[^Ѐ-ӿ]', '', 'g')))
                          * 1.0 / greatest(length(d.text), 1) > 0.25 THEN 'ru'
                     ELSE 'en'
                   END AS lang_guess,
                   md5(lower(regexp_replace(d.text, '\\s+', ' ', 'g'))) AS fingerprint,
                   len(regexp_extract_all(d.text,
                       '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f\x0b]+'))
                       AS n_bpe_tokens,
                   r.top_tok_n, r.rep_ratio,
                   CAST(CASE WHEN
                          round(len(list_filter(string_split(d.text, ' '),
                                x -> x IN ({stop_list}))) * 1.0
                                / greatest(len(string_split(d.text, ' ')), 1), 4)
                            BETWEEN 0.05 AND 0.6
                          AND len(string_split(d.text, ' ')) >= 20
                        THEN 1 ELSE 0 END AS BIGINT) AS passes_quality
            FROM documents d JOIN rep r ON r.doc = d.doc_id
        """,
        "exact_dedup_documents": """
            WITH all_docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text FROM
                (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 50)
            )
            SELECT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
                   count(*) AS n_dups, min(doc_id) AS keeper
            FROM all_docs GROUP BY 1
        """,
        "jaccard_pairs_documents": f"""
            WITH {_JACCARD_CTES}
            SELECT doc_a, doc_b, n_common,
                   round(n_common * 1.0 / (sa.n_grams + sb.n_grams - n_common), 4) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE n_common * 1.0 / (sa.n_grams + sb.n_grams - n_common) >= 0.2
        """,
        "neardup_components_documents": f"""
            WITH RECURSIVE {_JACCARD_CTES}, pairs AS (
              SELECT doc_a, doc_b FROM common
              JOIN sizes sa ON sa.doc_id = doc_a
              JOIN sizes sb ON sb.doc_id = doc_b
              WHERE n_common * 1.0 / (sa.n_grams + sb.n_grams - n_common) >= 0.2
            ), edges AS MATERIALIZED (
              -- MATERIALIZED: the reach recursion below joins edges
              -- once per iteration; left a view, DuckDB re-evaluates
              -- the whole jaccard CTE chain (posting self-join
              -- included) each round — the chunker-oracle lesson
              -- (SCALING_NOTES r5), found again at the sf4 mirror
              SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM pairs
            ), reach(node, comp) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node
            ), comp AS (
              SELECT node, min(comp) AS component FROM reach GROUP BY node
            )
            SELECT component, min(node) AS keeper, count(*) AS n_members
            FROM comp GROUP BY component
        """,
        "probe_url_counts_documents": """
            WITH corpus AS (
              SELECT CASE WHEN doc_id % 7 = 0
                          THEN 'see https://site' || CAST(doc_id % 5 AS VARCHAR)
                               || '.example.com/page?x=1 ' || text
                          ELSE text END AS text
              FROM documents
            ), urls AS (
              SELECT unnest(regexp_extract_all(text,
                       '[Hh][Tt][Tt][Pp][Ss]?://[A-Za-z0-9.-]+(/[^ \t\n]*)?', 0)) AS url
              FROM corpus
            )
            SELECT 'contains_probe' AS kind, probe AS key,
                   count(d.text) AS n  -- clean probe => 0, not absent
            FROM (VALUES ('spark'), ('customer line'), ('vector'),
                         ('zzz-not-present')) p(probe)
            LEFT JOIN documents d ON position(probe IN d.text) > 0
            GROUP BY probe
            UNION ALL
            SELECT 'url_domain' AS kind,
                   regexp_replace(lower(regexp_extract(url,
                       '[Hh][Tt][Tt][Pp][Ss]?://([A-Za-z0-9.-]+)', 1)),
                       '[.]+$', '') AS key,
                   count(*) AS n
            FROM urls GROUP BY 2
        """,
        "strip_boilerplate_documents": """
            WITH corpus AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 3 = 0
                          THEN 'COOKIE BANNER PLEASE ACCEPT TERMS' || chr(10) || text
                          ELSE text END AS text
              FROM documents
            ), lines AS (
              SELECT doc_id AS doc,
                     generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos,
                     unnest(string_split(text, chr(10))) AS line
              FROM corpus
            ), hot AS (
              SELECT line FROM lines WHERE length(line) >= 8
              GROUP BY line HAVING count(DISTINCT doc) >= 10
            ), kept AS (
              SELECT * FROM lines WHERE line NOT IN (SELECT line FROM hot)
            ), agg AS (
              SELECT doc, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
                     count(*) AS n_lines_kept
              FROM kept GROUP BY doc
            )
            -- all-boilerplate docs must still appear (empty, 0 lines)
            SELECT d.doc, coalesce(a.clean_text, '') AS clean_text,
                   coalesce(a.n_lines_kept, 0) AS n_lines_kept
            FROM (SELECT DISTINCT doc FROM lines) d
            LEFT JOIN agg a USING (doc)
        """,
        "length_percentiles_documents": """
            SELECT source, count(*) AS n,
                   round(quantile_cont(n_chars, 0.5), 4) AS p50,
                   round(quantile_cont(n_chars, 0.9), 4) AS p90,
                   round(quantile_cont(n_chars, 0.99), 4) AS p99,
                   max(n_chars) AS v_max
            FROM documents GROUP BY source
        """,
        "sample_split_documents": """
            WITH split_all AS (
              SELECT source, doc_id,
                     CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                          THEN 'train'
                          WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
                          THEN 'val' ELSE 'test' END AS split
              FROM documents
            ), counts AS (
              SELECT source, split,
                     CAST(count(*) AS BIGINT) AS split_n_full
              FROM split_all GROUP BY source, split
            ), sampled AS (
              SELECT source, doc_id, split FROM (
                SELECT source, doc_id, split,
                       row_number() OVER (
                         PARTITION BY source
                         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
                FROM split_all
              ) WHERE rn <= 10
            )
            SELECT s.source, s.doc_id, s.split, c.split_n_full
            FROM sampled s JOIN counts c
              ON s.source = c.source AND s.split = c.split
        """,
        "pii_scrub_documents": """
            WITH all_docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 3000000 AS doc_id,
                     'contact alice' || CAST(doc_id + 3000000 AS VARCHAR)
                       || '@example.com or +1-555-010-1234 ' || text AS text
              FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 40)
            )
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
                   len(regexp_extract_all(text,
                       '\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}')) AS n_phones,
                   length(regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_len
            FROM all_docs
        """,
        "embed_topk_neardup_exact": """
            SELECT 'topk' AS kind, CAST(0 AS BIGINT) AS id_a,
                   CAST(vec_id AS BIGINT) AS id_b, score
            FROM (
              SELECT vec_id,
                     round(list_cosine_similarity(embedding::DOUBLE[],
                           (SELECT embedding::DOUBLE[] FROM embeddings
                            WHERE vec_id = 0)), 4) AS score
              FROM embeddings
              ORDER BY score DESC, vec_id ASC LIMIT 10
            )
            UNION ALL
            SELECT 'neardup' AS kind, CAST(id_a AS BIGINT) AS id_a,
                   CAST(id_b AS BIGINT) AS id_b, cosine AS score
            FROM (
              -- vec_id < 2000: the exact-pairs arm is bounded to a
              -- fixed sample (see the Spark query's round-5 scale fix)
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                  b.embedding::DOUBLE[]), 4) AS cosine
              FROM (SELECT * FROM embeddings WHERE vec_id < 2000) a
              JOIN (SELECT * FROM embeddings WHERE vec_id < 2000) b
                ON a.vec_id < b.vec_id
            ) WHERE cosine >= 0.38
        """,
        "broadcast_join_orders": """
            SELECT c_mktsegment, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "semi_anti_customer": """
            SELECT c_custkey, 'has_order' AS tag FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
            UNION ALL
            SELECT c_custkey, 'no_big_order' AS tag FROM customer
            WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        """,
        "rollup_cube_sales": """
            SELECT 'rollup_orders' AS src, o_orderstatus AS k1,
                   o_orderpriority AS k2, count(*) AS n,
                   CAST(NULL AS DOUBLE) AS agg_val
            FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
            UNION ALL
            SELECT 'cube_lineitem' AS src, l_returnflag AS k1,
                   l_linestatus AS k2, count(*) AS n,
                   round(sum(l_quantity), 2) AS agg_val
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
            UNION ALL
            SELECT 'orders_by_month' AS src,
                   strftime(o_orderdate, '%Y-%m') AS k1,
                   CAST(NULL AS VARCHAR) AS k2, count(*) AS n,
                   round(sum(o_totalprice), 2) AS agg_val
            FROM orders GROUP BY 2
        """,
        "dsir_chunk_documents": """
            WITH RECURSIVE weights AS (
              SELECT doc_id,
                     round(ln(CAST(n_chars AS DOUBLE)) - 5.7, 6) AS log_w
              FROM documents
            ), gumbel AS (
              -- the sampler's seedless-deterministic Gumbel key: u from
              -- the first 12 md5 hex digits of the key (48 bits, exact
              -- in a double), g = -ln(-ln(u)); same double rounding as
              -- the Spark op (log_w to 6dp, then the sum to 6dp)
              SELECT doc_id, log_w,
                     round(log_w + -ln(-ln(
                       (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                             AS BIGINT) + 1.0) / (281474976710657.0)
                     )), 6) AS gumbel_key
              FROM weights
            ), sampled AS (
              SELECT doc_id, gumbel_key FROM gumbel
              ORDER BY gumbel_key DESC, doc_id LIMIT 40
            ), seq AS MATERIALIZED (
              -- MATERIALIZED: the recursive step below joins seq once
              -- per iteration (one per longest conversation); left as a
              -- view DuckDB re-tokenizes the corpus every iteration —
              -- 232 s vs 5.7 s at sf1 (measured)
              SELECT source AS conv, doc_id AS turn,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                     row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
              FROM documents
            ), rec AS (
              -- the greedy chunker's state machine: (chunk, pos) emitted
              -- per turn, post-state (s_cur, s_sum, s_pos) carried; an
              -- oversize turn (> 300 tokens) closes its own chunk
              SELECT conv, rn, turn, n_tokens,
                     CAST(0 AS BIGINT) AS chunk, 0 AS pos,
                     CASE WHEN n_tokens > 300 THEN CAST(1 AS BIGINT)
                          ELSE CAST(0 AS BIGINT) END AS s_cur,
                     CASE WHEN n_tokens > 300 THEN CAST(0 AS BIGINT)
                          ELSE n_tokens END AS s_sum,
                     CASE WHEN n_tokens > 300 THEN 0 ELSE 1 END AS s_pos
              FROM seq WHERE rn = 1
              UNION ALL
              SELECT s.conv, s.rn, s.turn, s.n_tokens,
                     CASE WHEN r.s_pos > 0 AND r.s_sum + s.n_tokens > 300
                          THEN r.s_cur + 1 ELSE r.s_cur END,
                     CASE WHEN r.s_pos > 0 AND r.s_sum + s.n_tokens > 300
                          THEN 0 ELSE r.s_pos END,
                     CASE WHEN s.n_tokens > 300
                          THEN (CASE WHEN r.s_pos > 0 AND r.s_sum + s.n_tokens > 300
                                     THEN r.s_cur + 1 ELSE r.s_cur END) + 1
                          ELSE CASE WHEN r.s_pos > 0 AND r.s_sum + s.n_tokens > 300
                                    THEN r.s_cur + 1 ELSE r.s_cur END END,
                     CASE WHEN s.n_tokens > 300 THEN CAST(0 AS BIGINT)
                          ELSE (CASE WHEN r.s_pos > 0 AND r.s_sum + s.n_tokens > 300
                                     THEN 0 ELSE r.s_sum END) + s.n_tokens END,
                     CASE WHEN s.n_tokens > 300 THEN 0
                          ELSE (CASE WHEN r.s_pos > 0 AND r.s_sum + s.n_tokens > 300
                                     THEN 0 ELSE r.s_pos END) + 1 END
              FROM rec r JOIN seq s ON s.conv = r.conv AND s.rn = r.rn + 1
            )
            SELECT 'dsir' AS kind, CAST(doc_id AS VARCHAR) AS conv,
                   CAST(NULL AS BIGINT) AS turn, CAST(NULL AS BIGINT) AS chunk,
                   CAST(NULL AS INTEGER) AS pos, CAST(NULL AS BIGINT) AS n_tokens,
                   gumbel_key AS score
            FROM sampled
            UNION ALL
            SELECT 'chunk' AS kind, conv, turn, chunk, pos, n_tokens,
                   CAST(NULL AS DOUBLE) AS score
            FROM rec
        """,
        "asof_join_events": """
            -- NOTE: DuckDB's ASOF pick among right rows tied on
            -- (user_id, ts) is unspecified; the Spark side tiebreaks on
            -- greatest event_id. The events data has no such ties
            -- (verified at sf0.01/sf0.1), so the comparison is
            -- deterministic here.
            SELECT p.event_id, p.user_id, round(c.value, 4) AS value_asof
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "sessionize_events": """
            WITH g AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                            - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                          > 1800 THEN 1 ELSE 0 END AS new_sess
              FROM events
            ), s AS (
              -- CAST: DuckDB promotes the window sum to HUGEINT, which
              -- the driver's hash formatter renders differently than
              -- BIGINT (the round-2 hash-fail class); Spark emits long
              SELECT user_id, event_id,
                     CAST(sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM g
            )
            SELECT user_id, session_id, count(*) AS n_events,
                   min(event_id) AS first_event
            FROM s GROUP BY user_id, session_id
        """,
        "interval_join_events": """
            WITH iv AS (
              -- event_id < 20000: fixed-size probe bound (see the
              -- Spark query's round-5 scale fix)
              SELECT event_id AS k,
                     CAST(floor(value * 100) AS BIGINT) AS s,
                     CAST(floor(value * 100) AS BIGINT) + 50 AS e
              FROM events WHERE event_type = 'error' AND event_id < 20000
            )
            SELECT a.k AS k_a, b.k AS k_b, a.s AS s_a, a.e AS e_a,
                   b.s AS s_b, b.e AS e_b
            FROM iv a JOIN iv b
              ON a.k < b.k AND a.s - 2 <= b.e AND b.s - 2 <= a.e
        """,
        "except_nations": """
            SELECT DISTINCT c_nationkey AS nationkey FROM customer
            WHERE c_acctbal > 9000
            EXCEPT
            SELECT DISTINCT s_nationkey AS nationkey FROM supplier
            WHERE s_acctbal > 9000
        """,
        "doc_pages_documents": """
            WITH payloads AS (
              SELECT doc_id // 3 AS pdoc_id,
                     string_agg(text, chr(12) ORDER BY doc_id) AS payload
              FROM documents GROUP BY 1
            )
            SELECT pdoc_id,
                   generate_subscripts(string_split(payload, chr(12)), 1) - 1 AS page_no,
                   length(unnest(string_split(payload, chr(12)))) AS n_chars
            FROM payloads
        """,
    }
