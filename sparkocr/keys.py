"""Character dictionary ("keys") support — S2/S3/S4 parity.

The reference's recognizer can only emit characters present in its keys
file (`models/ppocr_keys_v5.txt`, 18 382 lines — the CTC argmax ranges
over the vocabulary, index 0 = blank, rec.rs:16,55-59). The analog here:
an optional dictionary on :class:`EngineConfig`; characters outside it
behave as CTC **blanks** during decode (emit nothing, reset
``last_char``) — the model's answer to an unrecognizable glyph.

Loading mirrors the reference's three source shapes:

- :func:`load_keys_file`   ↔ ``Rec::from_file`` + keys path (rec.rs:51-70)
- :func:`load_keys_bytes`  ↔ ``Rec::from_bytes_with_keys`` (rec.rs:102-126)
- inline tuple             ↔ embedded bytes (main.rs:8-13); ship the keys
  file inside the ``--py-files`` zip and load via ``SparkFiles``

Per rec.rs:55-59 each line is one character with ``\\n``/``\\r``
stripped; blank padding at both ends is an index-bookkeeping detail of
the CTC table that has no analog here (membership is what matters).

On executors the dictionary rides the UDF closure (one deserialized
copy per worker process — the broadcast-variable pattern; at 18k chars
the closure is a few hundred KB, well under broadcast-worthy size).
"""

from __future__ import annotations

import numpy as np


def normalize_keys(chars) -> tuple[str, ...]:
    """Dedupe + sort into the canonical hashable form EngineConfig
    stores (sorted so config hashing is deterministic)."""
    return tuple(sorted(set(chars)))


def load_keys_bytes(data: bytes, encoding: str = "utf-8") -> tuple[str, ...]:
    """One key per line, ``\\n``/``\\r`` stripped (rec.rs:55-59); empty
    lines ignored. The WHOLE stripped line is kept — the reference keeps
    every non-newline character of a line, and ``vocab_lut`` iterates
    per-codepoint, so multi-codepoint keys contribute all their
    characters to the vocabulary (``normalize_keys`` dedupes)."""
    out = []
    for line in data.decode(encoding).split("\n"):
        ch = line.strip("\r\n")
        if ch:
            out.append(ch)
    return normalize_keys(out)


def load_keys_file(path: str, encoding: str = "utf-8") -> tuple[str, ...]:
    with open(path, "rb") as f:
        return load_keys_bytes(f.read(), encoding)


def vocab_lut(dictionary: tuple[str, ...]) -> tuple[np.ndarray, frozenset]:
    """(BMP boolean LUT, astral set) for vectorized membership — same
    shape as the punctuation/word LUTs in textgrid."""
    lut = np.zeros(0x10000, dtype=bool)
    astral = set()
    for key in dictionary:
        for ch in key:  # tolerate multi-codepoint keys
            cp = ord(ch)
            if cp < 0x10000:
                lut[cp] = True
            else:
                astral.add(cp)
    return lut, frozenset(astral)
