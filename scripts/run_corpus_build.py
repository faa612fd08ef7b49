"""Production entry point for the corpus build — the pretraining-data
sibling of ``run_extract.py``:

    python -m zipfile -c /tmp/sparkocr.zip sparkocr
    spark-submit --master <cluster> --py-files /tmp/sparkocr.zip \
        scripts/run_corpus_build.py --input .../documents.parquet \
        --output /path/out --config build.json [--sft]

``--config`` is a JSON object of :func:`sparkocr.corpus.
build_training_corpus` keyword arguments (or
:func:`~sparkocr.corpus.build_sft_corpus` ones with ``--sft``) — the
config-from-file surface, so a data team versions its build recipe as
an artifact next to the code (the analog of the reference's
model/config-from-file loading, main.rs:8-13). Unknown keys fail fast
with the accepted list. Every returned stage output lands under
``<output>/<name>/`` as parquet; the funnel is always requested and
also printed to stderr as the run's retention summary.
"""

from __future__ import annotations

import argparse
import inspect
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="parquet path: documents (doc_id, source, text) "
                        "or, with --sft, transcript turns")
    p.add_argument("--output", required=True)
    p.add_argument("--config", default=None,
                   help="JSON file of build keyword arguments")
    p.add_argument("--sft", action="store_true",
                   help="run build_sft_corpus over transcript turns")
    args = p.parse_args()

    from sparkocr.corpus import build_sft_corpus, build_training_corpus

    build = build_sft_corpus if args.sft else build_training_corpus
    conf: dict = {}
    if args.config:
        # validate BEFORE paying session startup — a config typo should
        # fail in milliseconds, not after the cluster spins up
        with open(args.config) as f:
            conf = json.load(f)
        # object-valued params (a trained model, an LM) cannot come
        # from JSON — reject them up front rather than failing deep in
        # a scoring join with a dict where a model was expected
        accepted = set(inspect.signature(build).parameters) - {
            "docs", "turns", "quality_model", "ppl_lm"}
        unknown = set(conf) - accepted
        if unknown:
            raise SystemExit(
                f"unknown config keys {sorted(unknown)}; accepted: "
                f"{sorted(accepted)}")
    conf["with_funnel"] = True

    from sparkocr.session import build_submit_session

    spark = build_submit_session("sparkocr-corpus-build")
    df = spark.read.parquet(args.input)
    out = build(df, **conf)
    for name, frame in out.items():
        frame.write.mode("overwrite").parquet(
            os.path.join(args.output, name))
    for row in (spark.read.parquet(os.path.join(args.output, "funnel"))
                .orderBy("stage_idx").collect()):
        print(f"# funnel {row['stage']}: {row['n']} {row['unit']}",
              file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
