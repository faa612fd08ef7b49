"""Training-data pipeline operators over document/transcript tables.

Everything here is expressed with built-in ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen-able) — no Python in the hot path — except
SimHash, which needs per-token hashing folds and runs as a vectorized
pandas UDF. Each op is designed for the 100 TB shape:

- exact dedup: one hash-shuffle on a 32-byte digest, not the payload
- n-gram Jaccard near-dup: inverted-index token join (explode distinct
  tokens → equi-join on token → count common), never O(n²) pairwise
- MinHash+LSH: signatures via k independent xxhash64 streams, banded
  bucket join so candidate pairs ~ collisions, not the cross product
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# ---------------------------------------------------------------------------
# text analysis

_STOPWORDS = (
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on",
    "with", "as", "at", "by", "an", "be", "this", "are", "or",
)


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count (JVM split, no UDF)."""
    return df.withColumn(
        "n_tokens", F.size(F.split(F.col(text_col), " ")).cast("int")
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality features: token count, stopword count/ratio,
    punctuation count, mean token length — the length/punct/stopword
    heuristics of a pretraining quality filter, all codegen'd."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
    n_punct = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[,.!?;:]", "")
    )
    return (
        df.withColumn("n_tokens", n_tokens.cast("int"))
        .withColumn("n_stop", n_stop.cast("int"))
        .withColumn("n_punct", n_punct.cast("int"))
        .withColumn(
            "stop_ratio",
            F.round(n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)), 4),
        )
        .withColumn(
            "mean_tok_len",
            F.round(
                (F.length(F.col(text_col)) - n_tokens + 1).cast("double")
                / F.greatest(n_tokens, F.lit(1)),
                4,
            ),
        )
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Character-class language heuristic (CJK / kana / hangul / cyrillic
    densities → zh/ja/ko/ru, else en). Range regexes only, so the same
    expression runs under Java regex and RE2."""
    total = F.greatest(F.length(F.col(text_col)), F.lit(1))

    def frac(pattern: str):
        kept = F.length(F.regexp_replace(F.col(text_col), pattern, ""))
        return (F.length(F.col(text_col)) - kept).cast("double") / total

    cjk = frac(r"[^一-鿿]")
    kana = frac(r"[^぀-ヿ]")
    hangul = frac(r"[^가-힯]")
    cyr = frac(r"[^Ѐ-ӿ]")
    return df.withColumn(
        "lang_guess",
        F.when(kana > 0.05, "ja")
        .when(cjk > 0.25, "zh")
        .when(hangul > 0.25, "ko")
        .when(cyr > 0.25, "ru")
        .otherwise("en"),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text (md5 so the DuckDB oracle can reproduce it bit-for-bit)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.withColumn("fingerprint", F.md5(norm))


# ---------------------------------------------------------------------------
# deduplication

def exact_dedup_groups(df: DataFrame, key_col: str, text_col: str = "text") -> DataFrame:
    """Exact dedup: group on the md5 digest (32-byte shuffle key, the
    payload never moves), emit (fingerprint, n_dups, keeper)."""
    return (
        with_fingerprint(df, text_col)
        .groupBy("fingerprint")
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.min(key_col).alias("keeper"),
        )
    )



def _shingle_posting(df: DataFrame, key_col: str, text_col: str,
                     n: int) -> DataFrame:
    """(doc, gram) posting list of distinct word n-grams per document —
    THE single home of shingle construction. Documents shorter than n
    tokens have NO n-grams (the sequence expression would otherwise emit
    one truncated shingle at index 0, silently diverging from the
    pos+1-join oracle SQL)."""
    toks = F.split(F.col(text_col), " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    return (
        df.where(F.size(toks) >= n)
        .select(F.col(key_col).alias("doc"), F.explode(grams).alias("gram"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 100,
) -> DataFrame:
    """Word n-gram Jaccard near-dup pairs via inverted-index join.

    distinct n-grams per doc → explode → self-equi-join on the n-gram →
    count common per pair → |A∩B| / (|A|+|B|-|A∩B|) ≥ threshold.
    Shuffle is bounded by total n-gram postings; no cross product.

    ``max_df`` is the stop-shingle guard that makes the join tractable at
    any scale: an n-gram appearing in more than ``max_df`` documents
    carries no near-dup signal but contributes O(df²) join fan-out, so
    hot n-grams are dropped BEFORE the self-join and pair sizes |A|,|B|
    are counted over the surviving postings (both sides of the Jaccard
    see the same filtered universe — the oracle SQL mirrors this
    exactly). ``max_df=None`` disables the cap (exact, small inputs
    only)."""
    # the (filtered) posting list feeds three consumers (sizes + both
    # self-join sides); without persistence Catalyst re-executes the
    # tokenize+shingle explode for each — materializing it once is the
    # cheaper plan at any scale (disk-spillable). Only the FINAL posting
    # is persisted; it stays cached for the session (call
    # spark.catalog.clearCache() between large corpora if needed).
    posting = _shingle_posting(df, key_col, text_col, n)
    if max_df is not None:
        # anti-join against the (small) hot-gram list: a partial-agg
        # count + AQE-sized join, cheaper at scale than a window over
        # every posting (which would sort-shuffle the full posting list)
        hot = (
            posting.groupBy("gram")
            .agg(F.count("*").alias("gram_df"))
            .where(F.col("gram_df") > max_df)
            .select("gram")
        )
        posting = posting.join(hot, "gram", "left_anti").persist()
    else:
        posting = posting.persist()
    sizes = posting.groupBy("doc").agg(F.count("*").alias("n_grams"))
    common = (
        posting.alias("a")
        .join(posting.alias("b"), "gram")
        .where(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_grams", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_grams", "nb"), "doc_b")
        .withColumn(
            "jaccard_raw",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .where(F.col("jaccard_raw") >= threshold)
        .select(
            "doc_a", "doc_b", "n_common",
            F.round("jaccard_raw", 4).alias("jaccard"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    key_col: str,
    text_col: str = "text",
    n_shingle: int = 3,
    n_hashes: int = 32,
) -> DataFrame:
    """MinHash signatures: k independent hash streams via
    xxhash64(seed_i, shingle); signature = array of per-stream minima.
    One explode + one groupBy; the shingle text itself never shuffles
    (only 8-byte hashes)."""
    posting = _shingle_posting(df, key_col, text_col, n_shingle)
    hashed = posting.select(
        "doc",
        *[
            F.xxhash64(F.lit(i), F.col("gram")).alias(f"h{i}")
            for i in range(n_hashes)
        ],
    )
    aggs = [F.min(f"h{i}").alias(f"m{i}") for i in range(n_hashes)]
    sig = hashed.groupBy("doc").agg(*aggs)
    return sig.select(
        "doc", F.array(*[f"m{i}" for i in range(n_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str = "text",
    n_shingle: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """MinHash+LSH candidate pairs: split the signature into ``bands``
    rows-per-band chunks, bucket-join on (band, chunk-hash). Candidates ~
    actual collisions; verify with exact signature similarity."""
    if bands < 1 or n_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide n_hashes ({n_hashes}) exactly — "
            "trailing signature entries would silently drop out of banding"
        )
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, key_col, text_col, n_shingle, n_hashes)
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    # both self-join sides recompute the signature pipeline; measured
    # cheaper than persisting here (the agg output is small and caching
    # breaks whole-stage fusion of the k-hash aggregate)
    buckets = sig.select("doc", "signature", F.explode(band_cols).alias("bb")).select(
        "doc", "signature", "bb.band", "bb.bucket"
    )
    pairs = (
        buckets.alias("a")
        .join(buckets.alias("b"), ["band", "bucket"])
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.round(
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        ).cast("double")
        / F.lit(n_hashes),
        4,
    )
    return pairs.select("doc_a", "doc_b", est.alias("est_jaccard"))


def simhash64(df: DataFrame, key_col: str, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens (vectorized pandas UDF: the
    per-bit majority fold has no good codegen form). Deterministic
    blake2b-based token hashing — stable across processes/machines."""
    import hashlib

    @F.pandas_udf(LongType())
    def sim(s: pd.Series) -> pd.Series:
        out = np.zeros(len(s), dtype=np.int64)
        for i, text in enumerate(s):
            if not text:
                continue
            toks = text.split(" ")
            hs = np.array(
                [
                    int.from_bytes(
                        hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
                    )
                    for t in toks
                ],
                dtype=np.uint64,
            )
            bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc = np.where(bits == 1, 1, -1).sum(axis=0)
            v = np.uint64(0)
            for b in range(64):
                if acc[b] > 0:
                    v |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(v.astype(np.int64))
        return pd.Series(out)

    return df.withColumn("simhash", sim(F.col(text_col)))


def simhash_neardup_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ ``max_hamming``.

    Banded join, exact by pigeonhole: the 64-bit hash splits into 4
    16-bit bands, and any pair within Hamming distance 3 (< 4 bands)
    must agree EXACTLY on at least one band — so candidates = band
    collisions (equi-join on (band_no, band_value), shuffle bounded by
    collisions) and the residual ``bit_count(xor) <= k`` filter makes
    the result exact, never a cross product. For ``max_hamming`` ≥ 4
    widen to 8×8-bit bands accordingly (not needed here)."""
    if max_hamming > 3:
        raise ValueError("4×16-bit banding is only exact for max_hamming <= 3")
    sh = simhash64(df, key_col, text_col).select(
        F.col(key_col).alias("doc"), "simhash"
    )
    bands = F.array(*[
        F.struct(
            F.lit(i).alias("band_no"),
            F.shiftrightunsigned("simhash", 16 * i)
            .bitwiseAND(F.lit(0xFFFF)).alias("band_val"),
        )
        for i in range(4)
    ])
    banded = sh.select("doc", "simhash", F.explode(bands).alias("b")).select(
        "doc", "simhash", "b.band_no", "b.band_val"
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band_no", "band_val"])
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )
