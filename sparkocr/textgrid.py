"""Shared low-level text-grid primitives (numpy-vectorized, no Spark).

The reference operates on pixel buffers; this engine operates on a
character grid: ``x`` = column within a line, ``y`` = line index scaled by
``LINE_HEIGHT`` sub-rows (see config.py). Everything here is deterministic
and pure so the same code backs both the single-node oracle and the Spark
pandas UDFs.
"""

from __future__ import annotations

import re

import numpy as np

from .config import (
    GLYPH_BOTTOM,
    GLYPH_TOP,
    LINE_HEIGHT,
    PUNCTUATIONS,
    SCORE_EDGE_PUNCT,
    SCORE_MARKUP,
    SCORE_OTHER,
    SCORE_PUNCT,
    SCORE_WORD,
)

# --- regex scanners ------------------------------------------------------

# order matters: comments / script / style are matched before generic tags
_COMMENT_RE = re.compile(r"<!--.*?(?:-->|\Z)", re.DOTALL)
_SCRIPT_RE = re.compile(
    r"<(script|style)\b[^<>]*>.*?(?:</\1\s*>|\Z)", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[/!A-Za-z][^<>]*>")
_ANSI_RE = re.compile(r"\x1b\[[0-9;]*[A-Za-z]")

_A_BOUND_RE = re.compile(r"<a\b[^<>]*>|</a\s*>", re.IGNORECASE)

# layout-region markers treated as boilerplate lines (the PDF/layout parser
# path for embedded documents carried by tool turns)
# [HEADER]/[FOOTER]-marked lines are boilerplate wherever the marker leads
# the line; [PAGE n] markers must stand alone
_BOILER_LINE_RE = re.compile(
    r"^\s*(\[(HEADER|FOOTER)\]|\[PAGE\s+\d+\]\s*$|={3,}\s*PAGE\s+\d+\s*={3,}\s*$)",
    re.IGNORECASE,
)

_NL = 10  # ord("\n")


def codepoints(text: str) -> np.ndarray:
    """Text → uint32 codepoint array (zero-copy-ish via UTF-32)."""
    if not text:
        return np.empty(0, dtype=np.uint32)
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def opaque_mask(text: str) -> np.ndarray:
    """Mask of OPAQUE markup regions — comments, <script>/<style>
    bodies, ANSI escapes — whose content must not influence any other
    analysis (in particular, an ``<a>`` inside a comment or a JS string
    is not a real anchor boundary)."""
    mask = np.zeros(len(text), dtype=bool)
    # exact fast gates: every comment/script match contains '<', every
    # ANSI match contains ESC — a C-level substring scan skips the regex
    # engines entirely on clean text (the common case for recognition
    # crops, whose markup was already blanked by crop_box)
    if "<" in text:
        for m in _COMMENT_RE.finditer(text):
            mask[m.start() : m.end()] = True
        for m in _SCRIPT_RE.finditer(text):
            # comments really do match BEFORE script (the ordering the
            # header comment promises): a <script> opener inside a
            # comment is inert text, and honoring it would extend the
            # unclosed-script fallback mask over the rest of the turn —
            # '<!-- <script src=x> --> Visible.' must keep 'Visible.'
            if mask[m.start()]:
                continue
            mask[m.start() : m.end()] = True
    if "\x1b" in text:
        for m in _ANSI_RE.finditer(text):
            mask[m.start() : m.end()] = True
    return mask


def markup_mask(text: str, opaque: np.ndarray | None = None) -> np.ndarray:
    """Boolean mask of characters that belong to markup: opaque regions
    (see :func:`opaque_mask`) plus tags.

    Analog of the zero-probability background pixels in the reference's
    probability map (det.rs:339-346): markup never contributes to a
    detected region.
    """
    # opaque_mask returns a fresh array — only a caller-supplied mask
    # needs the defensive copy
    mask = opaque_mask(text) if opaque is None else opaque.copy()
    if "<" in text:  # exact gate: every tag match contains '<'
        for m in _TAG_RE.finditer(text):
            mask[m.start() : m.end()] = True
    return mask


def anchor_mask(text: str, opaque: np.ndarray | None = None) -> np.ndarray:
    """Boolean mask of characters inside <a>…</a> (the link-density
    numerator). Nested/unbalanced anchors handled with a depth counter;
    an unclosed <a> extends to end of text. Anchor boundaries inside
    opaque markup (comments / script bodies) are ignored — a commented-
    out ``<a>`` must not flag the rest of the turn as link text."""
    mask = np.zeros(len(text), dtype=bool)
    if "<" not in text:  # exact gate: anchor boundaries require '<'
        return mask
    if opaque is None:
        opaque = opaque_mask(text)
    depth = 0
    pos = 0
    for m in _A_BOUND_RE.finditer(text):
        if len(opaque) and opaque[m.start()]:
            continue
        if depth > 0:
            mask[pos : m.start()] = True
        if m.group(0)[1] == "/":
            depth = max(0, depth - 1)
        else:
            depth += 1
        pos = m.end()
    if depth > 0:
        mask[pos:] = True
    return mask


def is_boiler_line(line: str) -> bool:
    return _BOILER_LINE_RE.match(line) is not None


# --- character classification (vectorized over codepoints) ---------------

_PUNCT_CODES = np.array(sorted(ord(c) for c in PUNCTUATIONS), dtype=np.uint32)

# 64 KB boolean LUT over the BMP: every punctuation/word codepoint is
# < 0x10000, so membership becomes one vectorized np.take with mode="clip"
# (astral codepoints clip to 0xFFFF which is in neither set) — ~50× faster
# than np.isin, which re-sorts per call and dominated the per-turn profile.
_PUNCT_LUT = np.zeros(0x10000, dtype=bool)
_PUNCT_LUT[_PUNCT_CODES] = True
assert not _PUNCT_LUT[0xFFFF]

# inclusive codepoint ranges scored as "word" characters (letters, digits,
# CJK, kana, hangul, fullwidth alnum). Deliberately range-based (no
# unicodedata) so the classification is trivially vectorizable and
# identical everywhere.
_WORD_RANGES = np.array(
    [
        (0x30, 0x39), (0x41, 0x5A), (0x61, 0x7A),          # ASCII alnum
        (0xC0, 0xD6), (0xD8, 0xF6), (0xF8, 0x17F),         # Latin-1/Ext-A
        (0x370, 0x3FF), (0x400, 0x4FF),                    # Greek, Cyrillic
        (0x3040, 0x30FF),                                  # kana
        (0x3400, 0x4DBF), (0x4E00, 0x9FFF),                # CJK
        (0xAC00, 0xD7AF),                                  # hangul
        (0xFF10, 0xFF19), (0xFF21, 0xFF3A), (0xFF41, 0xFF5A),  # fullwidth
    ],
    dtype=np.uint32,
)


_WORD_LUT = np.zeros(0x10000, dtype=bool)
for _lo, _hi in _WORD_RANGES:
    _WORD_LUT[_lo:_hi + 1] = True
assert not _WORD_LUT[0xFFFF]


def word_char_mask(cp: np.ndarray) -> np.ndarray:
    return np.take(_WORD_LUT, cp.astype(np.intp, copy=False), mode="clip")


def punct_mask(cp: np.ndarray) -> np.ndarray:
    return np.take(_PUNCT_LUT, cp.astype(np.intp, copy=False), mode="clip")


def is_punct_char(ch: str) -> bool:
    return ch in PUNCTUATIONS


def char_scores(text: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The deterministic "recognition model" (analog of Rec::run_model's
    argmax+score pass, rec.rs:341-357): per character, a confidence in
    [0,1] plus a blank mask.

    Returns ``(cp, scores, blank)`` where blank characters act like CTC
    index 0 (reset ``last_char``, emit nothing).
    """
    cp = codepoints(text)
    n = len(cp)
    scores = np.full(n, SCORE_OTHER, dtype=np.float32)
    if n == 0:
        return cp, scores, np.zeros(0, dtype=bool)

    mk = markup_mask(text)
    word = word_char_mask(cp)
    punct = punct_mask(cp)
    nl = cp == _NL
    space = cp == 0x20
    ctrl = (cp < 0x20) & ~nl  # control chars (tab already folded to space)

    scores[word | space | nl] = SCORE_WORD
    scores[punct] = SCORE_PUNCT
    if mk.any():
        # punctuation adjacent to a markup span → borderline confidence
        # (exercises the rec.rs:373-377 branch: kept, last_char
        # untouched). With no markup, adj is all-false and these three
        # writes are no-ops — skipped.
        adj = np.zeros(n, dtype=bool)
        adj[:-1] |= mk[1:]
        adj[1:] |= mk[:-1]
        scores[punct & adj & ~mk] = SCORE_EDGE_PUNCT
        scores[mk] = SCORE_MARKUP
        blank = ctrl & ~mk
    else:
        blank = ctrl
    return cp, scores, blank
