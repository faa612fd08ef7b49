"""Generate the committed golden fixtures (run once; re-run ONLY on an
intentional semantics change, and say so in the commit message).

Analog of the reference's checked-in res/{1..4}_ocr_result.png goldens:
deterministic fixture corpus → oracle extractor → JSON."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkocr.config import FLAGSHIP_CONFIG
from sparkocr.fixtures import generate_turns
from sparkocr.reference_impl import extract_turns

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "fixtures", "golden_extract.json")

GOLDEN_SEED = 42
GOLDEN_CONVS = 12
GOLDEN_MEAN_TURNS = 10


def main():
    turns = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in generate_turns(GOLDEN_SEED, GOLDEN_CONVS, GOLDEN_MEAN_TURNS)
    ]
    rows = extract_turns(turns, FLAGSHIP_CONFIG)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(rows, f, ensure_ascii=False, indent=1, sort_keys=True)
    n_blocks = sum(r["n_blocks"] for r in rows)
    print(f"wrote {len(rows)} turns / {n_blocks} blocks to {OUT}")


if __name__ == "__main__":
    main()
