"""End-to-end golden-fixture equality for the oracle pipeline (the analog
of comparing against res/{1..4}_ocr_result.png). A failure here means the
extraction SEMANTICS changed — that must be an intentional, documented
change that regenerates the goldens via tests/make_goldens.py."""

import json
import os

import pytest

from sparkocr.config import FLAGSHIP_CONFIG
from sparkocr.fixtures import generate_turns
from sparkocr.reference_impl import extract_turns

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "fixtures", "golden_extract.json")


@pytest.fixture(scope="module")
def golden_rows():
    with open(GOLDEN, encoding="utf-8") as f:
        return json.load(f)


def test_oracle_matches_committed_goldens(golden_rows):
    turns = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in generate_turns(42, 12, 10)
    ]
    rows = extract_turns(turns, FLAGSHIP_CONFIG)
    assert len(rows) == len(golden_rows)
    for got, exp in zip(rows, golden_rows):
        assert got["conv_id"] == exp["conv_id"]
        assert got["turn_idx"] == exp["turn_idx"]
        # byte equality of extracted text (the north-rule invariant)
        assert got["full_text"] == exp["full_text"], (
            got["conv_id"], got["turn_idx"])
        assert got["n_blocks"] == exp["n_blocks"]
        for gb, eb in zip(got["blocks"], exp["blocks"]):
            for k in ("pos", "text", "block_type", "left", "top", "width",
                      "height", "start", "end"):
                assert gb[k] == eb[k], (got["conv_id"], got["turn_idx"], k)
            assert abs(gb["confidence"] - eb["confidence"]) < 1e-6


def test_goldens_cover_all_payload_classes(golden_rows):
    """The corpus must exercise every payload class (FIXTURES.md §2):
    prose, CJK, JA, HTML-boilerplate, tool noise, fragments, documents,
    edge cases."""
    has_cjk = any(
        any("一" <= c <= "鿿" for c in r["full_text"])
        for r in golden_rows
    )
    has_kana = any(
        any("぀" <= c <= "ヿ" for c in r["full_text"])
        for r in golden_rows
    )
    has_empty = any(r["n_blocks"] == 0 for r in golden_rows)
    has_multi = any(r["n_blocks"] >= 2 for r in golden_rows)
    types = {b["block_type"] for r in golden_rows for b in r["blocks"]}
    assert has_cjk and has_kana and has_empty and has_multi
    assert {"prose", "list"} <= types


def test_spans_index_into_original_text(golden_rows):
    texts = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in generate_turns(42, 12, 10)
    }
    for r in golden_rows:
        text = texts[(r["conv_id"], r["turn_idx"])]
        for b in r["blocks"]:
            assert 0 <= b["start"] <= b["end"] <= len(text)
