"""Deterministic synthetic transcript generator (FIXTURES.md §1-2).

No runtime RNG: every choice derives from blake2b(counter), so the same
(seed, n_convs) always produces byte-identical corpora on any machine —
the property the bench relies on (identical input at local[8] / local[32]).

Schema matches BASELINE.json input_hint:
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
 ts:timestamp).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

_BASE_TS = datetime(2025, 1, 1, 0, 0, 0)

_ROLES = ("user", "assistant", "tool", "system")
_TOOLS = ("browser", "pdf_reader", "bash", "search")

_EN_WORDS = (
    "the quick brown fox jumps over lazy dog while morning light settles "
    "across quiet rivers and distant mountains where travelers exchange "
    "stories about weather markets harvest plans and the long road home"
).split()

_ZH_CHARS = (
    "数据处理引擎在大规模集群上运行需要仔细考虑分区倾斜与洗牌开销"
    "每个算子的语义必须与参考实现保持完全一致包括阈值与合并规则"
    "文本检测阶段计算链接密度并过滤样板内容识别阶段逐字符解码"
)

_JA_TEXT = (
    "これはテストです大規模な分散処理では順序の保証が重要になります"
    "テキスト抽出エンジンは検出と認識の二段階で構成されています"
    "すべての演算子は決定的でなければなりません"
)

_NAV_ITEMS = ("Home", "Products", "Pricing", "Docs", "About", "Careers", "Blog")


def _h(seed: int, *parts) -> int:
    """Deterministic 64-bit hash of (seed, *parts)."""
    msg = ("|".join(str(p) for p in parts) + f"|{seed}").encode()
    return int.from_bytes(hashlib.blake2b(msg, digest_size=8).digest(), "big")


def _en_sentence(seed: int, key, n_words: int) -> str:
    ws = [_EN_WORDS[_h(seed, key, i) % len(_EN_WORDS)] for i in range(n_words)]
    return " ".join(ws).capitalize() + "."


def _zh_sentence(seed: int, key, n_chars: int) -> str:
    cs = [_ZH_CHARS[_h(seed, key, i) % len(_ZH_CHARS)] for i in range(n_chars)]
    return "".join(cs) + "。"


def _ja_sentence(seed: int, key, n_chars: int) -> str:
    cs = [_JA_TEXT[_h(seed, key, i) % len(_JA_TEXT)] for i in range(n_chars)]
    return "".join(cs) + "。"


def _payload(seed: int, conv: int, turn: int) -> tuple[str, int]:
    """Returns (text, payload_class). Classes per FIXTURES.md §2."""
    cls = _h(seed, "cls", conv, turn) % 10
    k = (conv, turn)
    if cls == 0:  # plain EN prose, multi-line paragraph
        return (
            _en_sentence(seed, (*k, 0), 12) + "\n"
            + _en_sentence(seed, (*k, 1), 10) + "\n\n"
            + _en_sentence(seed, (*k, 2), 14)
        ), 0
    if cls == 1:  # CJK prose
        return _zh_sentence(seed, (*k, 0), 30) + "\n" + _zh_sentence(seed, (*k, 1), 24), 1
    if cls == 2:  # Japanese prose
        return _ja_sentence(seed, (*k, 0), 28), 2
    if cls == 3:  # HTML boilerplate wrapping real content
        nav = " ".join(
            f'<a href="/{it.lower()}">{it}</a>'
            for it in _NAV_ITEMS[: 3 + _h(seed, "nav", *k) % 4]
        )
        body = _en_sentence(seed, (*k, 0), 16) + "\n" + _en_sentence(seed, (*k, 1), 13)
        return (
            f"<html><head><title>t</title></head><body>\n"
            f"<nav>{nav}</nav>\n"
            f"<div class=\"content\">\n{body}\n</div>\n"
            f"<footer><a href=\"/terms\">Terms</a> <a href=\"/privacy\">Privacy</a></footer>\n"
            f"</body></html>"
        ), 3
    if cls == 4:  # markdown / tool noise: fences, repeats, ANSI
        return (
            "Compiling module " + str(_h(seed, "m", *k) % 1000) + " please wait\n"
            + "==========================================\n"
            + "\x1b[32mProgress\x1b[0m ......................... done and finished\n"
            + "```\n    x = compute(" + str(_h(seed, "x", *k) % 97) + ")\n    return x\n```\n"
            + _en_sentence(seed, (*k, 0), 11)
        ), 4
    if cls == 5:  # adjacent fragments on consecutive lines (merge path)
        a = _en_sentence(seed, (*k, 0), 8)
        b = _en_sentence(seed, (*k, 1), 8)
        c = _en_sentence(seed, (*k, 2), 8)
        return a + "\n" + b + "\n" + c, 5
    if cls == 6:  # embedded pseudo-document (layout-region parser path)
        return (
            "[PAGE 1]\n[HEADER] Quarterly Report Confidential\n"
            + _en_sentence(seed, (*k, 0), 15) + "\n"
            + _en_sentence(seed, (*k, 1), 12) + "\n"
            + "[FOOTER] page 1 of 2\n\f[PAGE 2]\n"
            + _en_sentence(seed, (*k, 2), 14) + "\n[FOOTER] page 2 of 2"
        ), 6
    if cls == 7:  # edge cases
        sub = _h(seed, "edge", *k) % 4
        return ("", "   \n  \t ", "tiny", "<div><span></span></div>")[sub], 7
    if cls == 8:  # mixed: list + table-ish content
        return (
            "Shopping notes below\n"
            + "- " + _en_sentence(seed, (*k, 0), 6) + "\n"
            + "- " + _en_sentence(seed, (*k, 1), 7) + "\n"
            + "- " + _en_sentence(seed, (*k, 2), 5)
        ), 8
    # cls == 9: entities + punctuation cascade
    return (
        "Tom &amp; Jerry said &quot;hello&quot; twice!!\n"
        + _en_sentence(seed, (*k, 0), 12) + "???"
    ), 9


def conv_sizes(seed: int, n_convs: int, mean_turns: int = 8) -> list[int]:
    """Zipf-skewed conversation sizes: most convs near the mean, a heavy
    head (conv 0 gets ~100× the median) to exercise skew handling."""
    if mean_turns < 2:
        raise ValueError(
            f"mean_turns must be ≥ 2 (conversations are multi-turn by "
            f"definition), got {mean_turns}")
    sizes = []
    for c in range(n_convs):
        base = 2 + _h(seed, "sz", c) % (2 * mean_turns - 2)
        if c == 0:
            base = mean_turns * 100  # the whale conversation
        elif c % 37 == 1:
            base = mean_turns * 10
        sizes.append(base)
    return sizes


def generate_turns(seed: int = 42, n_convs: int = 20, mean_turns: int = 8):
    """Yield transcript rows as dicts (deterministic, ordered by conv/turn;
    shuffle happens at write time if desired)."""
    for c, n_turns in enumerate(conv_sizes(seed, n_convs, mean_turns)):
        conv_id = f"conv-{seed:04d}-{c:06d}"
        for t in range(n_turns):
            text, cls = _payload(seed, c, t)
            role = _ROLES[_h(seed, "role", c, t) % len(_ROLES)]
            tool = _TOOLS[_h(seed, "tool", c, t) % len(_TOOLS)] if role == "tool" else ""
            yield {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": _BASE_TS + timedelta(seconds=c * 100000 + t * 30),
            }


def turns_pandas(seed: int = 42, n_convs: int = 20, mean_turns: int = 8):
    """Corpus as a pandas DataFrame, rows deterministically shuffled on
    disk-order (so ordering must be recovered via window rank)."""
    import pandas as pd

    rows = list(generate_turns(seed, n_convs, mean_turns))
    # deterministic shuffle: sort by a hash of the key
    rows.sort(key=lambda r: _h(seed, "shuf", r["conv_id"], r["turn_idx"]))
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df
