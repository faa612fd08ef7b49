"""Corpus-operator scaling probe: run the heavy dedup/mix operators on
the SAME replicated corpus at two parallelism levels (local[N] vs
local[4N]) and report throughput at both plus the scaling efficiency —
the two-cluster-size evidence of the north rule, applied to the
training-data operators. (The extraction engine's own pinned-executor
cohort study lives in bench.py / BENCH/SCALING_NOTES.md; the cohort
design can't be reused here because these operators are SHUFFLE-heavy —
sharding the corpus per executor would dedup each shard independently
and change the semantics — so this probe scales task slots inside one
session instead, with the process CPU-pinned so local[N] really has N
CPUs rather than N task slots on a 32-CPU box.)

The job is IDENTICAL at both sizes — same shuffle-partition count, same
packer shard count, same corpus layout, all sized for the LARGE config
(exactly how a production job is provisioned once and then run on
whatever cluster is available). An earlier probe variant derived those
knobs from the core count; that measures two different jobs, and at
this corpus size the extra partitions' fixed per-task cost made the
large config read *slower* — a probe artifact, not a property of the
operators. N defaults to 2 (so 4N = 8): both configs stay far below the
box's ~30k turns/sec shared-memory-bus ceiling documented in
BENCH/SCALING_NOTES.md, which a 32-core config slams into.

Usage: python scripts/bench_corpus_ops.py [--replicas 40] [--n 2]

The corpus is the sf0.1 documents table replicated --replicas times;
each replica appends a replica-unique token so replication itself does
not manufacture whole-document duplicates (the natural duplicate rate
of the base corpus is preserved; substring dedup still finds the real
planted passages in every replica). Each config runs in a fresh
CPU-pinned subprocess; passes interleave N/4N so one machine-load burst
cannot poison a single config. Results print as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.1"

# ---------------------------------------------------------------------------
# child mode: pin to the first N CPUs, run the operator suite once


def _child(cores: int, replicas: int, big_cores: int) -> None:
    # pin BEFORE the JVM spawns: pyspark's java child inherits the
    # affinity mask, so local[N] gets N real CPUs, not N slots on 32
    os.sched_setaffinity(0, set(range(cores)))
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sparkocr.analysis import (dedup_paragraphs, dedup_substrings,
                                   mix_corpus, pack_sequences)

    # every layout knob derives from the LARGE config so the two runs
    # execute the same physical job; only the resource count differs
    n_parts = 4 * big_cores
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"corpus-ops-scaling-{cores}")
        .config("spark.sql.shuffle.partitions", str(n_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "source", "text")
        reps = spark.range(replicas).select(F.col("id").alias("rep"))
        corpus = (
            docs.crossJoin(reps)
            .select(
                (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
                "source",
                F.concat_ws(" ", "text",
                            F.concat(F.lit("rep"), F.col("rep"))).alias("text"),
            )
            .repartition(n_parts)
            .localCheckpoint(eager=True)
        )
        n_docs = corpus.count()
        out: dict = {"n_docs": n_docs}

        t = time.time()
        dedup_substrings(corpus, "doc_id", min_len=20) \
            .write.format("noop").mode("overwrite").save()
        out["substr_sec"] = round(time.time() - t, 2)

        t = time.time()
        dedup_paragraphs(corpus, "doc_id") \
            .write.format("noop").mode("overwrite").save()
        out["para_sec"] = round(time.time() - t, 2)

        t = time.time()
        toks = corpus.select(
            "doc_id", "source",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
        # token budget scales with the corpus (≈ a quarter of it) so the
        # mixture draw + packer do work proportional to input — a fixed
        # small budget selects a constant ~10k docs at any corpus size
        # and the phase degenerates to pure per-job fixed cost
        chosen = mix_corpus(toks, {"web": 0.6, "books": 0.3, "code": 0.1},
                            2_000_000 * max(1, replicas // 40))
        # shard count sized for the LARGE cluster and held fixed — the
        # small config just runs more shards per slot, exactly like a
        # provisioned job on a half-size cluster (at a fixed 4 shards
        # the packer tops out at sources×4 tasks and could not scale)
        pack_sequences(chosen, max_tokens=4096, n_shards=2 * big_cores) \
            .write.format("noop").mode("overwrite").save()
        out["mix_pack_sec"] = round(time.time() - t, 2)

        out["total_sec"] = round(
            out["substr_sec"] + out["para_sec"] + out["mix_pack_sec"], 2)
        out["docs_per_sec"] = round(n_docs / out["total_sec"], 1)
        print("RESULT " + json.dumps(out), flush=True)
    finally:
        spark.stop()


def _run(cores: int, replicas: int, big_cores: int) -> dict:
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--_child",
         str(cores), "--replicas", str(replicas),
         "--_big", str(big_cores)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        timeout=1800, check=True)
    line = next(l for l in p.stdout.splitlines() if l.startswith("RESULT "))
    return json.loads(line[len("RESULT "):])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=40)
    ap.add_argument("--n", type=int, default=2,
                    help="small cluster size; the large one is 4n")
    ap.add_argument("--_child", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--_big", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args._child is not None:
        _child(args._child, args.replicas, args._big or 4 * args._child)
        return

    # interleave N / 4N passes (best of 2 each) so one machine-load
    # burst cannot poison a single config
    results: dict[int, list[dict]] = {args.n: [], 4 * args.n: []}
    for _ in range(2):
        for cores in (args.n, 4 * args.n):
            r = _run(cores, args.replicas, 4 * args.n)
            print(f"# local[{cores}]: {r}", file=sys.stderr, flush=True)
            results[cores].append(r)
    best = {c: min(rs, key=lambda r: r["total_sec"])
            for c, rs in results.items()}
    small, large = best[args.n], best[4 * args.n]
    eff = (large["docs_per_sec"] / small["docs_per_sec"]) / 4
    per_op_eff = {
        op: round(small[op] / large[op] / 4, 3)
        for op in ("substr_sec", "para_sec", "mix_pack_sec")
    }
    print(json.dumps({
        "metric": "corpus-ops throughput, local[N] vs local[4N], CPU-pinned",
        "n_docs": small["n_docs"],
        "n_cores": [args.n, 4 * args.n],
        "per_op_sec": {f"local[{c}]": {k: v for k, v in best[c].items()
                                       if k.endswith("_sec")}
                       for c in (args.n, 4 * args.n)},
        "docs_per_sec": {f"local[{c}]": best[c]["docs_per_sec"]
                         for c in (args.n, 4 * args.n)},
        "scaling_efficiency": round(eff, 3),
        "per_op_efficiency": per_op_eff,
    }))


if __name__ == "__main__":
    main()
