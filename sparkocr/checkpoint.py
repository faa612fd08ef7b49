"""Resumable checkpointed extraction (the north-rule scale requirement).

The reference is request/response — a crashed worker loses one image
(engine.rs:213-215, dead-worker → EngineError). At 10^12 turns a run
MUST be resumable, so the job is decomposed into ``n_buckets``
deterministic conversation buckets (``pmod(xxhash64(conv_id), n)`` —
whole conversations stay together, the unit of exactly-once is the
bucket) processed in batches of whole buckets:

- output:  ``{out}/data/bucket=K/…`` parquet, written with **dynamic
  partition overwrite** so a re-run of a half-written batch replaces its
  partitions instead of appending duplicates;
- ledger:  ``{out}/_ledger/bucket=K.json`` — written only AFTER the
  batch's data commit; carries per-bucket extraction-quality metrics
  (turns, blocks, empty rate, mean confidence, error count) + wall time;
- lineage: ``{out}/_ledger/manifest.json`` — input path, config hash,
  engine version, bucket count; validated on resume (a changed config or
  input must not silently mix outputs).

Resume = run the same call again: done buckets are read from the ledger
and anti-joined away (set-difference on bucket ids — no data read for
completed work). On a real cluster the ledger lives on the object store
next to the output (task-committer semantics are identical); Iceberg
snapshot metadata could replace it 1:1 but the plain-files form keeps the
local harness dependency-free.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, dataclass

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import __version__
from .config import EngineConfig, FLAGSHIP_CONFIG
from .engine import SparkOcrEngine


@dataclass(frozen=True)
class RunManifest:
    input_path: str
    input_schema: str
    config_hash: str
    engine_version: str
    n_buckets: int


def _config_hash(cfg: EngineConfig) -> str:
    return hashlib.sha256(repr(sorted(cfg.__dict__.items())).encode()).hexdigest()[:16]


def _ledger_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_ledger")


def done_buckets(out_dir: str) -> set[int]:
    d = _ledger_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("bucket=") and name.endswith(".json"):
            out.add(int(name[len("bucket="):-len(".json")]))
    return out


def _check_manifest(out_dir: str, manifest: RunManifest) -> None:
    path = os.path.join(_ledger_dir(out_dir), "manifest.json")
    os.makedirs(_ledger_dir(out_dir), exist_ok=True)
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        if prev != asdict(manifest):
            raise ValueError(
                f"checkpoint lineage mismatch: resuming {asdict(manifest)} "
                f"over a run recorded as {prev} — refusing to mix outputs"
            )
    else:
        with open(path, "w") as f:
            json.dump(asdict(manifest), f, indent=2)


def run_checkpointed(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    input_path: str = "",
    config: EngineConfig = FLAGSHIP_CONFIG,
    n_buckets: int = 16,
    batch_buckets: int = 4,
    max_batches: int | None = None,
    conv_col: str = "conv_id",
) -> dict:
    """Run (or resume) the fused extraction over ``df`` with per-bucket
    checkpoints. Returns a summary dict. ``max_batches`` caps work this
    call (used by the resume test to simulate a mid-run kill — a real
    kill between batches is equivalent because the ledger write is the
    commit point)."""
    eng = SparkOcrEngine(spark, config)
    # the schema is part of lineage even when input_path is unset: a
    # resume against structurally different data must refuse, not mix
    manifest = RunManifest(input_path, df.schema.simpleString(),
                           _config_hash(config), __version__, n_buckets)
    _check_manifest(out_dir, manifest)

    bucket = F.pmod(F.xxhash64(F.col(conv_col)), F.lit(n_buckets)).cast("int")
    src = df.withColumn("bucket", bucket)
    data_dir = os.path.join(out_dir, "data")

    done = done_buckets(out_dir)
    remaining = [b for b in range(n_buckets) if b not in done]
    batches = [
        remaining[i:i + batch_buckets]
        for i in range(0, len(remaining), batch_buckets)
    ]
    if max_batches is not None:
        batches = batches[:max_batches]

    processed: list[int] = []
    for batch in batches:
        t0 = time.time()
        part = src.where(F.col("bucket").isin([int(b) for b in batch]))
        out = eng.extract(part,
                          passthrough=(conv_col, "turn_idx", "role", "bucket"))
        # dynamic overwrite: a retried batch replaces its own partitions
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(data_dir)
        )
        wall = time.time() - t0
        # per-bucket extraction-quality metrics for the ledger, computed
        # from the committed output (one scan of the fresh partitions).
        # A batch whose buckets held zero rows writes no parquet files;
        # reading the (possibly still empty) output dir then fails on
        # schema inference — such buckets simply get zero-count entries.
        try:
            committed = spark.read.parquet(data_dir)
        except AnalysisException:
            # schema-inference failure = genuinely nothing written yet;
            # other errors must surface (zero-filled metrics would be a
            # permanent false record for buckets that DID commit data)
            committed = None
        stats = {} if committed is None else {
            int(r["bucket"]): r
            for r in committed
            .where(F.col("bucket").isin([int(b) for b in batch]))
            .groupBy("bucket")
            .agg(
                F.count("*").alias("n_turns"),
                F.sum("n_blocks").alias("n_blocks"),
                F.round(F.avg(F.when(F.col("n_blocks") == 0, 1.0).otherwise(0.0)), 6)
                .alias("empty_rate"),
                F.round(F.avg(F.expr(
                    "aggregate(blocks, cast(0.0 as double), (a, b) -> a + b.confidence)"
                    " / greatest(size(blocks), 1)")), 6).alias("mean_confidence"),
                F.sum(F.when(F.col("error_code").isNotNull(), 1).otherwise(0))
                .alias("n_errors"),
            )
            .collect()
        }
        # commit point: ledger entries written only after the data commit
        for b in batch:
            r = stats.get(int(b))
            entry = {
                "bucket": int(b),
                "n_turns": int(r["n_turns"]) if r else 0,
                "n_blocks": int(r["n_blocks"]) if r else 0,
                "empty_rate": float(r["empty_rate"]) if r else 0.0,
                "mean_confidence": float(r["mean_confidence"]) if r else 0.0,
                "n_errors": int(r["n_errors"]) if r else 0,
                "batch_wall_s": round(wall, 3),
                "lineage": asdict(manifest),
                # lets read_checkpointed reconstruct an EMPTY result when
                # a completed run committed only zero-row buckets (an
                # empty write emits no parquet files to infer from)
                "output_schema": out.schema.json(),
            }
            # atomic commit marker: write-to-tmp + rename, so a kill
            # mid-write can never leave a truncated file that
            # done_buckets() would count as a completed bucket
            final = os.path.join(_ledger_dir(out_dir), f"bucket={int(b)}.json")
            tmp = final + ".tmp"
            with open(tmp, "w") as f:
                json.dump(entry, f)
            os.replace(tmp, final)
        processed.extend(int(b) for b in batch)

    return {
        "n_buckets": n_buckets,
        "already_done": sorted(done),
        "processed": processed,
        "remaining": [b for b in range(n_buckets)
                      if b not in done and b not in processed],
    }


def read_checkpointed(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read back the (possibly partial) checkpointed output, restricted to
    buckets whose ledger entry exists — uncommitted partitions from a
    killed batch are excluded, so readers only ever see exactly-once
    data."""
    done = sorted(done_buckets(out_dir))
    if not done:
        raise FileNotFoundError(
            f"no committed buckets in {out_dir} yet — the run has not "
            "completed any batch (ledger is empty)"
        )
    try:
        df = spark.read.parquet(os.path.join(out_dir, "data"))
    except AnalysisException:
        # every committed bucket was empty: the write emitted no parquet
        # files, so there is nothing to infer a schema from — a
        # legitimately completed run over empty input must still read
        # back (as empty), not crash. The ledger entries carry the
        # output schema for exactly this case.
        from pyspark.sql.types import StructType

        for b in done:
            path = os.path.join(_ledger_dir(out_dir), f"bucket={b}.json")
            with open(path) as f:
                entry = json.load(f)
            if "output_schema" in entry:
                schema = StructType.fromJson(
                    json.loads(entry["output_schema"]))
                return spark.createDataFrame([], schema)
        raise  # pre-output_schema ledger: surface the original error
    return df.where(F.col("bucket").isin([int(b) for b in done]))
