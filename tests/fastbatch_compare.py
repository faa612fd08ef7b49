"""Shared byte-exactness comparator for the fastbatch differential
checks — the ONE home imported by both the committed hypothesis suite
(tests/test_fastbatch.py) and the sustained pre-release harness
(scripts/fuzz_fastbatch.py), so the two can never drift apart (e.g. if
Block grows a field, both update together). Deliberately
dependency-light: plain asserts, no pytest/hypothesis imports, usable
from a bare interpreter."""

from sparkocr.config import FLAGSHIP_CONFIG
from sparkocr.fastbatch import batch_extract_simple
from sparkocr.pipeline import extract_turn, extract_turn_auto


def assert_matches(texts, config=FLAGSHIP_CONFIG, min_eligible=None,
                   allow_formfeed=False, roles=None):
    """For every row either the batch result is byte-identical to
    pipeline.extract_turn (text, confidence BITS, spans, geometry,
    block type) or the row is declared ineligible (None) and falls
    back. Returns the number of rows that took the fast path.
    ``allow_formfeed`` mirrors the engine's non-routing mode: \\f rows
    run the stage-3 general machine and are still compared against
    extract_turn (which folds \\f — the same fallback the engine uses
    when routing is off). ``roles`` mirrors the routing mode: the
    oracle becomes extract_turn_auto(t, role) — the engine's
    route_documents fallback — so stage-4 document rows are compared
    against the layout-parse branch."""
    got = batch_extract_simple(list(texts), config,
                               allow_formfeed=allow_formfeed,
                               roles=roles)
    n_fast = 0
    for k, (t, r) in enumerate(zip(texts, got)):
        if r is None:
            continue
        n_fast += 1
        if roles is not None:
            want = extract_turn_auto(t, roles[k], config)
        else:
            want = extract_turn(t, config)
        assert r.error_code == want.error_code, ascii(t)
        assert r.full_text == want.full_text, ascii(t)
        assert len(r.blocks) == len(want.blocks), ascii(t)
        for a, b in zip(r.blocks, want.blocks):
            assert a == b, (ascii(t), a, b)  # frozen dataclass: bitwise fields
    if min_eligible is not None:
        assert n_fast >= min_eligible, (n_fast, min_eligible)
    return n_fast
