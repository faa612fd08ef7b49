"""Cluster entry point: the extraction job as run via spark-submit.

    python -m zipfile -c /tmp/sparkocr.zip sparkocr
    spark-submit --master local[8] --py-files /tmp/sparkocr.zip \
        scripts/run_extract.py \
        --input /root/testdata/sf0.001/documents.parquet --as-transcripts \
        --output /tmp/extract_out --n-buckets 16 --batch-buckets 4

On a real cluster, only --master/--deploy-mode change: the code ships in
the --py-files zip (the reference's embedded-model trick, main.rs:8-13 —
zero install on executors), the session is created WITHOUT a master so
spark-submit's cluster manager wins, and the checkpoint ledger makes
re-submission after any failure resume instead of restart. Re-running a
completed job is a no-op.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def build_session(app: str) -> SparkSession:
    # delegate to the ONE shared builder in sparkocr.session so the
    # cluster path can never drift from the local/bench/test entry
    # points (or from run_corpus_build.py's)
    from sparkocr.session import build_submit_session

    return build_submit_session(app)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="parquet path (transcripts or documents)")
    p.add_argument("--output", required=True, help="checkpointed output dir")
    p.add_argument("--as-transcripts", action="store_true",
                   help="input is a documents table; map to transcript shape")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--batch-buckets", type=int, default=8)
    p.add_argument("--mode", default="parquet",
                   choices=("parquet", "text", "json", "debug"),
                   help="output sink (CLI parity with the reference's "
                        "--mode, main.rs:199-208): parquet = the "
                        "checkpointed table only; text/json/debug "
                        "additionally render the extracted result "
                        "through the matching sink under "
                        "<output>/render")
    p.add_argument("--keys-file", default=None,
                   help="character-vocabulary keys file (one key per "
                        "line, rec.rs:55-59); out-of-vocab chars decode "
                        "as blanks. Ship it next to the --py-files zip "
                        "or on shared storage. The config hash in the "
                        "lineage manifest covers the dictionary, so a "
                        "resume with different keys refuses to mix.")
    args = p.parse_args()

    from sparkocr.checkpoint import run_checkpointed
    from sparkocr.config import FLAGSHIP_CONFIG

    config = FLAGSHIP_CONFIG
    if args.keys_file:
        from sparkocr.keys import load_keys_file

        config = config.with_dictionary(load_keys_file(args.keys_file))

    spark = build_session("sparkocr-extract")
    df = spark.read.parquet(args.input)
    if args.as_transcripts:
        from sparkocr.sources import docs_as_transcripts

        df = docs_as_transcripts(df)
    summary = run_checkpointed(
        spark, df, args.output, input_path=args.input, config=config,
        n_buckets=args.n_buckets, batch_buckets=args.batch_buckets,
    )
    if args.mode != "parquet":
        import os

        from sparkocr.checkpoint import read_checkpointed
        from sparkocr.sources import (
            write_debug_html,
            write_json_blocks,
            write_text,
        )

        # read_checkpointed, not a raw read of {output}/data: it applies
        # the ledger's committed-bucket filter and survives a completed
        # zero-row run (which writes no parquet files at all)
        result = read_checkpointed(spark, args.output)
        render = os.path.join(args.output, "render")
        if args.mode == "text":
            write_text(result, render)
        elif args.mode == "json":
            write_json_blocks(
                result.select("conv_id", "turn_idx", "n_blocks",
                              "blocks", "full_text"), render)
        else:
            write_debug_html(result, render, text_df=df)
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
