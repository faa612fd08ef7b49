"""Batch-vectorized fast path for simple turns (round-4 throughput work).

The per-turn pipeline already short-circuits the common chat-message
shape — one line, no markup, no ANSI — inside ``detect.find_text_boxes``
(det.py fast path), but the per-turn cost was still dominated by the
~40 small numpy allocations each ``recognize_crop`` call makes. This
module lifts that work to the Arrow-batch level: eligible turns are
detected with cheap C-level string scans, their canonical crops are
concatenated into ONE flat codepoint array (NUL separators), and the
whole batch runs the decode state machine (recognize.decode semantics,
rec.rs:344-398) in a handful of numpy passes. Per-row Python shrinks to
string slicing plus one small float32 reduction.

Byte-exactness contract: for every eligible turn the result equals
``pipeline.extract_turn`` EXACTLY (text, confidence bits, spans,
geometry, block type) — enforced by the differential suite in
tests/test_fastbatch.py. Anything the flat machine cannot reproduce
bit-for-bit (entities decoding into markup, lone surrogates) is
declared ineligible and falls back to the per-turn path; eligibility
errs toward fallback, never toward approximation.

Eligible = text is a str containing none of ``\\n \\r \\f < \\x1b``
(the det.py fast-path conditions plus the TurnGrid separators) whose
canonical crop still contains no ``<``/ESC (entity decode can mint
them). Entity-minted newlines (``&#10;``) stay in-domain: detection
geometry comes from the original single-line text on both paths, and
``canonicalize`` caps the crop's line count at ``max_rec_lines`` (no
overflow is possible), so the flat machine scores/emits the minted
``\\n`` exactly as ``recognize_crop`` does — covered by the
``&#10;`` rows of the randomized differential test. The decode
boundary rules are preserved across the flat array: the NUL separator
is a CTC blank
(resets ``last_char``, emits nothing) and the punct-collapse pass is
crop-id-guarded so it never merges across turns.
"""

from __future__ import annotations

import numpy as np

from .config import (
    DEFAULT_CONFIG,
    GLYPH_BOTTOM,
    GLYPH_TOP,
    LINE_HEIGHT,
    MIN_BOX_SIZE,
    SCORE_OTHER,
    SCORE_PUNCT,
    SCORE_WORD,
    EngineConfig,
)
from .pipeline import Block, TurnResult
from .recognize import canonicalize, classify_block, decode
from .textgrid import _NL, _PUNCT_LUT, _WORD_LUT, is_boiler_line

_EMPTY = TurnResult(blocks=[], full_text="")


def _eligible(t) -> bool:
    """The det.py fast-path shape: one line (no \\n, and no \\r/\\f that
    TurnGrid would fold into one), no markup, no ANSI."""
    return (
        isinstance(t, str)
        and "\n" not in t and "\r" not in t and "\f" not in t
        and "<" not in t and "\x1b" not in t
    )


def batch_extract_simple(
    texts, config: EngineConfig = DEFAULT_CONFIG
) -> list:
    """Process every eligible turn of ``texts`` (a sequence of
    already-``_clean_text``-ed values) in one vectorized pass. Returns a
    list aligned with ``texts``: a ``TurnResult`` where the fast path
    applied, ``None`` where the caller must run the per-turn pipeline."""
    n = len(texts)
    out: list = [None] * n
    border = config.rect_border_size
    grid_h = LINE_HEIGHT  # single line
    top = max(GLYPH_TOP - border, 0)
    bottom = min(GLYPH_BOTTOM + border, grid_h - 1)
    height = bottom - top + 1

    idxs: list[int] = []      # rows entering the flat decode
    canons: list[str] = []
    metas: list[tuple] = []   # (left, right)
    for i in range(n):
        t = texts[i]
        if not _eligible(t):
            continue
        if ("[" in t or "=" in t) and is_boiler_line(t):
            out[i] = _EMPTY
            continue
        c0 = len(t) - len(t.lstrip(" \t"))
        c1 = len(t.rstrip(" \t")) - 1
        if c1 - c0 <= MIN_BOX_SIZE:
            out[i] = _EMPTY
            continue
        left = max(c0 - border, 0)
        right = min(c1 + border, len(t) - 1)
        canon = canonicalize(t[left:right + 1], config.max_rec_lines)
        # post-canon gate: entity decode can mint '<' (markup scoring
        # leaves the flat machine's domain) — those rows take the exact
        # per-turn path. Minted '\n' needs no gate: canonicalize caps
        # line count, and the flat machine reproduces recognize_crop's
        # newline handling bit-for-bit (see module docstring).
        if "<" in canon or "\x1b" in canon:
            continue
        idxs.append(i)
        canons.append(canon)
        metas.append((left, right))

    if idxs:
        try:
            _decode_flat(idxs, canons, metas, out, config,
                         top, height)
        except Exception:
            # poison batch (e.g. lone surrogate breaking the joint
            # encode): retry nothing here — per-row fallback preserves
            # the per-turn path's own poison-row containment
            for i in idxs:
                out[i] = None
    return out


def _decode_flat(idxs, canons, metas, out, config, top, height) -> None:
    k = len(canons)
    flat = "\x00".join(canons)
    cp = np.frombuffer(flat.encode("utf-32-le"), dtype=np.uint32)
    # crop id per flat position; separators carry the PRECEDING crop's
    # id, harmless — they are blanks and never emitted
    lens = np.fromiter((len(c) for c in canons), dtype=np.int64, count=k)
    seg = lens + 1  # each crop + its trailing separator (last has none)
    ids = np.repeat(np.arange(k, dtype=np.int64), seg)[:len(cp)]

    # char_scores for the markup-free case (textgrid.char_scores with
    # mk all-false): word/space/nl → SCORE_WORD, punct → SCORE_PUNCT,
    # rest SCORE_OTHER; blank = control chars except \n (separator \x00
    # included — the boundary reset)
    word = np.take(_WORD_LUT, cp.astype(np.intp, copy=False), mode="clip")
    punct = np.take(_PUNCT_LUT, cp.astype(np.intp, copy=False), mode="clip")
    nl = cp == _NL
    space = cp == 0x20
    scores = np.full(len(cp), SCORE_OTHER, dtype=np.float32)
    scores[word | space | nl] = SCORE_WORD
    scores[punct] = SCORE_PUNCT
    # blank = control chars except \n (the NUL separator included — the
    # crop-boundary reset); the dictionary-blank rule is decode's own
    blank = (cp < 0x20) & ~nl

    # decode the WHOLE flat array in one call of the shared machine
    # (recognize.decode with seg_ids — the single home of the decode
    # semantics; this module owns only the scoring and the reassembly)
    f_cp, f_sc, f_id = decode(cp, scores, blank, config, seg_ids=ids)
    # per-crop slice bounds in the kept stream (f_id ascending)
    bounds = np.searchsorted(f_id, np.arange(k + 1))

    for j in range(k):
        a, b = bounds[j], bounds[j + 1]
        d_cp = f_cp[a:b]
        d_sc = f_sc[a:b]
        text = d_cp.tobytes().decode("utf-32-le")
        if len(d_sc) == 0:
            conf = 0.0
        else:
            # float32 pairwise sum over the same-length slice — the
            # exact arithmetic of recognize_crop (rec.rs:179-186)
            conf = float(np.float32(d_sc.sum(dtype=np.float32))
                         / np.float32(len(d_sc)))
        left, right = metas[j]
        blk = Block(
            pos=0, text=text, confidence=conf,
            block_type=classify_block(canons[j]),
            left=left, top=top, width=right - left + 1, height=height,
            start=left, end=right + 1,
        )
        out[idxs[j]] = TurnResult(blocks=[blk], full_text=text)
