"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line to stdout:

    {"metric": "...", "value": <total headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "turns_per_sec_local8": ..., "turns_per_sec_local32": ...,
     "scaling_efficiency": ...}

The scaling block evidences the north-rule "N → 4N executors at ≥0.8
efficiency" criterion in-sandbox: the identical fused extraction job is
run in two fresh subprocesses at local[8] and local[32] over the same
deterministic ~200k-turn corpus (documents replicated 40×), and
efficiency = (tps_32 / tps_8) / 4. Skip with SPARK_GRAFT_BENCH_SCALING=0.

All diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"
SCALING_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "40"))

# Headline subset of __spark_entry__.queries(): the flagship extraction
# plus one representative per operator family (dedup, near-dup, ANN,
# window, interval merge, quality, layout). Full coverage runs in
# scripts/check_correctness.py; the bench measures throughput.
HEADLINE = [
    "extract_documents",
    "extract_blocks_flat",
    "exact_dedup_documents",
    "minhash_lsh_pairs_documents",
    "jaccard_pairs_documents",
    "simhash_documents",
    "ann_cosine_topk",
    "lsh_topk_embeddings",
    "window_rank_events",
    "interval_merge_events",
    "quality_documents",
    "lang_id_documents",
]

_SCALING_CODE = r'''
import sys, time
from pyspark.sql import functions as F
from sparkocr.session import get_spark
from sparkocr.engine import SparkOcrEngine

cores, sf_dir, reps = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
spark = get_spark(cores=cores, app_name=f"scaling-{cores}",
                  shuffle_partitions=cores * 2,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
    F.col("source").alias("conv_id"),
    F.col("doc_id").cast("int").alias("turn_idx"),
    F.lit("user").alias("role"), "text")
corpus = (
    docs.crossJoin(spark.range(reps).select(F.col("id").alias("rep")))
    .select(F.concat_ws("-", "conv_id", "rep").alias("conv_id"),
            "turn_idx", "role", "text")
    .repartition(cores * 4)
    .cache()
)
n = corpus.count()
eng = SparkOcrEngine(spark)
eng.extract(corpus.limit(2000)).count()  # warm python workers + JIT
t0 = time.time()
eng.extract(corpus).count()
dt = time.time() - t0
print(f"SCALING {cores} {n} {dt:.4f}", flush=True)
spark.stop()
'''


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_headline() -> tuple[dict[str, float], float]:
    import __spark_entry__ as entrymod
    from sparkocr.session import get_spark

    spark = get_spark(cores=CPUS, app_name="bench",
                      shuffle_partitions=CPUS,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    # warm the session (JVM/Arrow/python-worker spinup outside timings)
    spark.range(1000).selectExpr("sum(id)").collect()
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            n = df.count()
            timings[name] = round(time.time() - t0, 3)
            _log(f"bench {name}: {n} rows in {timings[name]}s")
        except Exception as e:  # keep the bench alive; a broken query is visible as absence
            _log(f"bench {name}: FAILED {e}")
    spark.stop()
    return timings, round(sum(timings.values()), 3)


def run_scaling() -> dict:
    out = {}
    for cores in (8, 32):
        env = dict(os.environ)
        r = subprocess.run(
            [sys.executable, "-c", _SCALING_CODE, str(cores), SF_DIR, str(SCALING_REPS)],
            capture_output=True, text=True, env=env, timeout=1200,
        )
        line = next((l for l in r.stdout.splitlines() if l.startswith("SCALING")), None)
        if line is None:
            _log(f"scaling run local[{cores}] failed:\n{r.stderr[-2000:]}")
            return {}
        _, c, n, dt = line.split()
        out[int(c)] = (int(n), float(dt))
        _log(f"scaling local[{cores}]: {n} turns in {dt}s "
             f"({int(n)/float(dt):.0f} turns/sec)")
    tps8 = out[8][0] / out[8][1]
    tps32 = out[32][0] / out[32][1]
    eff = (tps32 / tps8) / 4.0
    return {
        "scaling_corpus_turns": out[32][0],
        "turns_per_sec_local8": round(tps8, 1),
        "turns_per_sec_local32": round(tps32, 1),
        "scaling_efficiency": round(eff, 3),
    }


def write_baseline_md(result: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    lines = [
        "# BENCH baseline — measured in-sandbox",
        "",
        f"- sf dir: `{result['sf_dir']}`  ·  headline total: "
        f"**{result['value']} s** across {len(result['queries'])} queries",
        "",
        "| query | sec |",
        "|---|---|",
    ]
    for k, v in result["queries"].items():
        lines.append(f"| {k} | {v} |")
    if "scaling_efficiency" in result:
        lines += [
            "",
            "## N → 4N scaling (north-rule criterion, evidenced via "
            "local[8] vs local[32] on the same input)",
            "",
            f"- corpus: {result['scaling_corpus_turns']} turns "
            "(documents ×40, deterministic)",
            f"- local[8]:  **{result['turns_per_sec_local8']} turns/sec**",
            f"- local[32]: **{result['turns_per_sec_local32']} turns/sec**",
            f"- scaling efficiency (tps32/tps8)/4 = "
            f"**{result['scaling_efficiency']}** (target ≥ 0.8)",
        ]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    timings, total = run_headline()
    result = {
        "metric": "headline query wall time (sum) + extraction scaling",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "sf_dir": SF_DIR,
        "cpus": CPUS,
    }
    if RUN_SCALING:
        result.update(run_scaling())
    try:
        write_baseline_md(result)
    except Exception as e:
        _log(f"BASELINE.md write failed: {e}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
