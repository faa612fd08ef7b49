"""Relational operators Spark lacks as built-ins, composed from
DataFrame primitives (SURVEY §2.6 gap-fills; no UDFs, fully
Catalyst-optimizable).

``asof_join`` — the time-series join ("latest right row at or before
each left row"). Implemented as union + partitioned running ``last``
rather than the naive range self-join: ONE shuffle on (by, ts), no
per-key fan-out, no skew amplification — the shape that survives
10^12-row event tables. A right row and a left row at the identical
timestamp match (inclusive, `<=`), mirroring DuckDB/pandas ASOF
semantics; ties inside `right` resolve to the greatest tiebreak value.

``interval_overlap_join`` — the D9 overlap predicate
(det.rs:429-464) lifted to DataFrame level: pairs of intervals that
overlap within ±threshold slack. Banded equi-join on interval buckets
turns the θ-join into an equi-join + residual predicate, so Spark
shuffles on the band key instead of building a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    right_cols: tuple = ("value",),
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach ``right_cols`` from the latest right row
    with ``right.on <= left.on`` and the same ``by`` key (null when no
    prior right row exists)."""
    rc = {c: f"{c}{suffix}" for c in right_cols}
    # the carried payload is a STRUCT of the right row's columns: the
    # running `last(..., ignorenulls)` must skip only "no right row
    # here", never "right row whose value happens to be null" — a struct
    # is non-null whenever the right row exists, so the latest right ROW
    # wins even when its payload columns are null (DuckDB/pandas asof
    # semantics)
    rv = F.struct(*[F.col(c).alias(c) for c in right_cols])
    # a right row with a NULL `on` key can never be "at or before" any
    # left instant (DuckDB/pandas asof never match a null key) — and
    # unfiltered it would sort nulls-FIRST and pollute every left row
    # before the first real right row
    r = right.where(F.col(on).isNotNull()).select(
        F.col(by), F.col(on), F.lit(0).alias("__side"), rv.alias("__rv"),
        *( [F.col(tiebreak).alias("__tb")] if tiebreak else [F.lit(0).alias("__tb")] ),
    )
    # left __tb never influences the result (right rows precede left at
    # equal instants via __side) — but it must TYPE-match right's __tb
    # for the union, so the placeholder is a typed null, not lit(0)
    l = left.select(
        "*", F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        (F.col(tiebreak) if tiebreak and tiebreak in left.columns
         else F.lit(None).cast(r.schema["__tb"].dataType)).alias("__tb"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows (__side 0) sort before left rows at the same instant →
    # inclusive as-of; __tb orders equal-instant right rows deterministically
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn(
        "__rv",
        F.last(F.when(F.col("__side") == 0, F.col("__rv")), ignorenulls=True).over(w),
    )
    for c in right_cols:
        u = u.withColumn(rc[c], F.col("__rv")[c])
    return u.where(F.col("__side") == 1).drop("__side", "__tb", "__rv")


def sessionize(
    df: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: rows of one ``by`` key belong to the
    same session while consecutive timestamps are within
    ``gap_seconds``; a larger gap starts a new session. Adds a dense
    ``session_id`` (0-based per key, ordered by time).

    One window over (by, ts): the new-session flag is
    ``ts - lag(ts) > gap``, and the running sum of flags numbers the
    sessions — one shuffle on the key, no self-join. The transcript
    use: splitting a long conversation into activity episodes before
    per-session metrics."""
    order = [F.col(ts_col).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else [])
    w = Window.partitionBy(by).orderBy(*order)
    # NTZ columns can't cast straight to long under ANSI; going through
    # TIMESTAMP first is exact (session timezone is pinned to UTC)
    secs = F.col(ts_col).cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    new_sess = F.when(gap.isNull() | (gap <= gap_seconds), 0).otherwise(1)
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )


def interval_overlap_join(
    df: DataFrame,
    key_col: str,
    start_col: str = "start",
    end_col: str = "end",
    threshold: int = 0,
    band: int = 1000,
) -> DataFrame:
    """Self-join pairs whose [start, end] intervals overlap within
    ±threshold (the boxes_overlap_with_threshold predicate at table
    scale). Each interval is exploded into the ``band``-sized buckets it
    touches; candidate pairs share a bucket (equi-join), then the exact
    predicate filters, and dedup keeps one row per pair. Bucket count
    per interval = O(length/band) — pick ``band`` ≈ typical interval
    length."""
    slack = threshold

    def _bucket(c):
        # bucket id = floor(x/band)·band in pure LONG arithmetic (pmod
        # is non-negative, so this floors toward -inf). The obvious
        # floor(x/band) runs through double division, which rounds
        # 64-bit endpoints above 2^53 (e.g. nanosecond timestamps) into
        # wrong buckets and silently drops overlapping pairs; the
        # scaled multiple preserves bucket equality and ordering with
        # no division at all.
        c = c.cast("long")
        return c - F.pmod(c, F.lit(band))

    banded = df.select(
        F.col(key_col).alias("k"),
        F.col(start_col).alias("s"),
        F.col(end_col).alias("e"),
        _bucket(F.col(start_col) - slack).alias("b0"),
        F.explode(
            F.sequence(
                _bucket(F.col(start_col) - slack),
                _bucket(F.col(end_col) + slack),
                F.lit(band).cast("long"),
            )
        ).alias("band"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    # dedupe WITHOUT a shuffle: a pair sharing several buckets exits the
    # equi-join once per shared bucket; each interval's bucket range is
    # contiguous, so the FIRST shared bucket is max(b0_a, b0_b) — keep
    # only that row (map-side filter replacing a dropDuplicates exchange)
    return (
        a.join(b, ["band"])
        .where(
            (F.col("a.k") < F.col("b.k"))
            & (F.col("a.s") - slack <= F.col("b.e"))
            & (F.col("b.s") - slack <= F.col("a.e"))
            & (F.col("band") == F.greatest(F.col("a.b0"), F.col("b.b0")))
        )
        .select(
            F.col("a.k").alias("k_a"), F.col("b.k").alias("k_b"),
            F.col("a.s").alias("s_a"), F.col("a.e").alias("e_a"),
            F.col("b.s").alias("s_b"), F.col("b.e").alias("e_b"),
        )
    )
