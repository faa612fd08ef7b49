"""Corpus-operator scaling probe: run the heavy dedup/mix operators on
the SAME replicated corpus at two parallelism levels (local[N] vs
local[4N]) and report throughput at both plus the scaling efficiency —
the two-cluster-size evidence of the north rule, applied to the
training-data operators (the extraction engine's own cohort-based study
lives in bench.py / BENCH/SCALING_NOTES.md).

Usage: python scripts/bench_corpus_ops.py [--replicas 40] [--n 8]

The corpus is the sf0.1 documents table replicated --replicas times;
each replica appends a replica-unique token so replication itself does
not manufacture whole-document duplicates (the natural duplicate rate
of the base corpus is preserved; substring dedup still finds the real
planted passages in every replica). Results print as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"


def _session(cores: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"corpus-ops-scaling-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def _corpus(spark: SparkSession, replicas: int):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    return (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
            "source",
            F.concat_ws(" ", "text",
                        F.concat(F.lit("rep"), F.col("rep"))).alias("text"),
        )
        .repartition(64)
    )


def _run(cores: int, replicas: int) -> dict:
    from sparkocr.analysis import (dedup_paragraphs, dedup_substrings,
                                   mix_corpus, pack_sequences)

    spark = _session(cores)
    try:
        corpus = _corpus(spark, replicas).localCheckpoint(eager=True)
        n_docs = corpus.count()
        out = {}

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
        chosen = mix_corpus(toks, {"web": 0.6, "books": 0.3, "code": 0.1},
                            2_000_000)
        pack_sequences(chosen, max_tokens=4096, n_shards=4) \
            .write.format("noop").mode("overwrite").save()
        out["mix_pack_sec"] = round(time.time() - t, 2)

        out["n_docs"] = n_docs
        out["total_sec"] = round(
            out["substr_sec"] + out["para_sec"] + out["mix_pack_sec"], 2)
        out["docs_per_sec"] = round(n_docs / out["total_sec"], 1)
        return out
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=40)
    ap.add_argument("--n", type=int, default=8,
                    help="small cluster size; the large one is 4n")
    args = ap.parse_args()

    # interleave N / 4N passes (best of 2 each) so one machine-load
    # burst cannot poison a single config
    results: dict[int, list[dict]] = {args.n: [], 4 * args.n: []}
    for _ in range(2):
        for cores in (args.n, 4 * args.n):
            results[cores].append(_run(cores, args.replicas))
    best = {c: min(rs, key=lambda r: r["total_sec"])
            for c, rs in results.items()}
    small, large = best[args.n], best[4 * args.n]
    eff = (large["docs_per_sec"] / small["docs_per_sec"]) / 4
    per_op_eff = {
        op: round(small[op] / large[op] / 4, 3)
        for op in ("substr_sec", "para_sec", "mix_pack_sec")
    }
    print(json.dumps({
        "metric": "corpus-ops throughput, local[N] vs local[4N]",
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
