"""LM-driven data selection and tokenization (sparkocr.lm): unigram-LM
perplexity scoring, DSIR importance resampling, BPE train/encode — hand
goldens against the closed-form math, independent pure-Python oracles
(a textbook Sennrich-style BPE trainer, a sequential-merge encoder, a
Counter-based perplexity model over real testdata), determinism, edge
cases, and plan-shape asserts."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from sparkocr.lm import (
    UnigramLM,
    bpe_encode,
    dsir_sample,
    dsir_weights,
    perplexity_scores,
    train_bpe,
    train_unigram_lm,
    with_perplexity,
    word_frequencies,
)

SF = "/root/testdata/sf0.001"
_WS = re.compile("[ \t\n\r\f\x0b]+")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pytokens(text):
    return [w for w in _WS.split(text.lower()) if w]


# ---------------------------------------------------------------------------
# unigram LM + perplexity


def test_unigram_lm_hand_golden(spark):
    # corpus: "a a b" → N=3, V=2, alpha=0.5 → denom = 3 + 0.5*3 = 4.5
    df = _docs(spark, [(0, "a a b")])
    m = train_unigram_lm(df, alpha=0.5)
    assert (m.n_tokens, m.n_types) == (3, 2)
    got = {r["token"]: r["logprob"] for r in m.table.collect()}
    assert got["a"] == pytest.approx(math.log(2.5 / 4.5))
    assert got["b"] == pytest.approx(math.log(1.5 / 4.5))
    assert m.oov_logprob == pytest.approx(math.log(0.5 / 4.5))


def test_unigram_lm_vocab_cap_deterministic(spark):
    # 4 types, cap 2: keep by (count desc, token asc) → "c"(3), then the
    # count-2 tie "a" < "b" → "a"; N keeps the capped-away mass (7)
    df = _docs(spark, [(0, "c c c a a b b d")])
    m = train_unigram_lm(df, vocab_size=2, alpha=1.0)
    kept = sorted(r["token"] for r in m.table.collect())
    assert kept == ["a", "c"]
    assert (m.n_tokens, m.n_types) == (8, 2)
    denom = 8 + 1.0 * 3
    got = {r["token"]: r["logprob"] for r in m.table.collect()}
    assert got["c"] == pytest.approx(math.log(4 / denom))
    assert m.oov_logprob == pytest.approx(math.log(1 / denom))


def test_perplexity_hand_golden_and_empty(spark):
    ref = _docs(spark, [(0, "a a b")])
    m = train_unigram_lm(ref, alpha=0.5)
    df = _docs(spark, [(0, "a b"), (1, "zz zz"), (2, ""), (3, None)])
    got = {r["doc_id"]: (r["ppl"], r["n_scored"])
           for r in perplexity_scores(df, m).collect()}
    lp_a, lp_b = math.log(2.5 / 4.5), math.log(1.5 / 4.5)
    assert got[0] == (round(math.exp(-(lp_a + lp_b) / 2), 4), 2)
    # all-OOV doc: ppl = exp(-oov) exactly
    assert got[1] == (round(math.exp(-m.oov_logprob), 4), 2)
    # empty / NULL text: present, NULL ppl, 0 scored
    assert got[2] == (None, 0)
    assert got[3] == (None, 0)


def test_with_perplexity_preserves_rows(spark):
    ref = _docs(spark, [(0, "x y")])
    df = _docs(spark, [(0, "x"), (1, ""), (2, "y y")])
    out = with_perplexity(df, train_unigram_lm(ref))
    assert out.count() == 3
    assert set(out.columns) == {"doc_id", "text", "ppl", "n_scored"}


def test_perplexity_python_oracle_on_testdata(spark):
    """Independent Counter-based model over the real documents table:
    train on even doc_ids, score odd ones, compare every score."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ref = docs.where("doc_id % 2 = 0")
    tgt = docs.where("doc_id % 2 = 1")
    m = train_unigram_lm(ref, alpha=0.5)
    got = {r["doc_id"]: (r["ppl"], r["n_scored"])
           for r in perplexity_scores(tgt, m).collect()}

    counts = Counter()
    for r in ref.select("text").collect():
        counts.update(_pytokens(r["text"] or ""))
    n, v = sum(counts.values()), len(counts)
    denom = n + 0.5 * (v + 1)
    oov = math.log(0.5 / denom)

    rows = tgt.select("doc_id", "text").collect()
    assert len(rows) > 10
    for r in rows:
        toks = _pytokens(r["text"] or "")
        if not toks:
            assert got[r["doc_id"]] == (None, 0)
            continue
        lps = [math.log((counts[t] + 0.5) / denom) if t in counts else oov
               for t in toks]
        want = math.exp(-sum(lps) / len(lps))
        ppl, n_scored = got[r["doc_id"]]
        assert n_scored == len(toks)
        assert ppl == pytest.approx(want, rel=1e-6, abs=1e-3)


def test_unigram_lm_empty_corpus(spark):
    m = train_unigram_lm(_docs(spark, []).where("doc_id < 0"))
    assert (m.n_tokens, m.n_types) == (0, 0)
    # denom = alpha·1 → oov logprob 0 → every doc scores ppl 1.0
    got = perplexity_scores(_docs(spark, [(0, "a b")]), m).head()
    assert (got["ppl"], got["n_scored"]) == (1.0, 2)


def test_perplexity_plan_shape(spark):
    """Broadcast LM join; exactly one Exchange (the per-doc aggregate),
    and it carries only skinny partial-agg rows — never text."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    m = UnigramLM(
        table=_docs(spark, [(0, "a")]).select(
            F.col("text").alias("token"),
            F.lit(-1.0).alias("logprob")),
        oov_logprob=-2.0, n_tokens=1, n_types=1)
    plan = perplexity_scores(docs, m)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    for frag in plan.split("Exchange")[1:]:
        assert "text#" not in frag.split("\n")[0]


# ---------------------------------------------------------------------------
# DSIR


def test_dsir_weights_math_oracle(spark):
    """Trust only the bucket-hash expression (extracted once from
    Spark); recompute the smoothed log-ratio weights in pure Python and
    compare — an independent check of the LM/floor/aggregation math."""
    from sparkocr.lm import _gram_buckets

    rows = [(0, "the cat sat"), (1, "the dog ran far"),
            (2, "qq zz qq"), (3, "")]
    df = _docs(spark, rows)
    target = df.where("doc_id < 2")
    nb, alpha = 97, 0.5
    buckets = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id",
            _gram_buckets(F.col("text"), nb).alias("b")).collect()
    }
    t_counts = Counter(b for d in (0, 1) for b in buckets[d])
    r_counts = Counter(b for d in buckets for b in buckets[d])
    n_t, n_r = sum(t_counts.values()), sum(r_counts.values())

    def lp(c, n):
        return math.log((c + alpha) / (n + alpha * nb))

    want = {
        d: round(sum(lp(t_counts[b], n_t) - lp(r_counts[b], n_r)
                     for b in bs), 6)
        for d, bs in buckets.items()
    }
    got = {r["doc_id"]: (r["log_w"], r["n_feats"])
           for r in dsir_weights(df, target, n_buckets=nb,
                                 alpha=alpha).collect()}
    for d, bs in buckets.items():
        assert got[d] == (pytest.approx(want[d], abs=2e-6), len(bs))
    # target-like docs outweigh the off-target one
    assert got[0][0] > got[2][0] and got[1][0] > got[2][0]
    # empty doc present with the empty-product weight
    assert got[3] == (0.0, 0)


def test_dsir_sample_deterministic_and_bounded(spark):
    df = _docs(spark, [(i, f"word{i} common text") for i in range(20)])
    w = dsir_weights(df, df.where("doc_id < 5"), n_buckets=101)
    a = [r["doc_id"] for r in dsir_sample(w, 7).collect()]
    b = [r["doc_id"] for r in dsir_sample(w, 7).collect()]
    assert a == b and len(a) == 7 and len(set(a)) == 7
    assert dsir_sample(w, 100).count() == 20  # k > n: everything
    assert dsir_sample(w, 0).count() == 0
    with pytest.raises(ValueError):
        dsir_sample(w, -1)


def test_dsir_validation(spark):
    df = _docs(spark, [(0, "a")])
    with pytest.raises(ValueError):
        dsir_weights(df, df, n_buckets=0)
    with pytest.raises(ValueError):
        dsir_weights(df, df, alpha=0.0)


# ---------------------------------------------------------------------------
# BPE


def _ref_train_bpe(word_freqs, num_merges):
    """Textbook Sennrich formulation on space-joined symbol strings —
    independent of the package's tuple-based implementation."""
    vocab = {" ".join(list(w) + ["</w>"]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for sym_str, freq in vocab.items():
            syms = sym_str.split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b) = best[0]
        pat = re.compile(
            r"(?<!\S)" + re.escape(a + " " + b) + r"(?!\S)")
        vocab = {pat.sub(a + b, s): f for s, f in vocab.items()}
        merges.append((a, b))
    return merges


def _ref_encode_word(word, merges):
    """Sequential application of merges in learned order — a different
    strategy from the package's rank-greedy encoder; for BPE the two
    are equivalent, which is the cross-check."""
    syms = list(word) + ["</w>"]
    for a, b in merges:
        i = 0
        while i < len(syms) - 1:
            if syms[i] == a and syms[i + 1] == b:
                syms[i:i + 2] = [a + b]
            else:
                i += 1
    return syms


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quicker they come the quicker they go"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "how quickly daft jumping zebras vex the dog"),
    (4, "the jugs the box the fox the dog the dog"),
]


def test_bpe_train_matches_textbook_reference(spark):
    df = _docs(spark, CORPUS)
    got = [(r["left"], r["right"])
           for r in train_bpe(df, num_merges=30, min_freq=1,
                              max_words=1000).orderBy("rank").collect()]
    wf = Counter(t for _, txt in CORPUS for t in _pytokens(txt))
    assert got == _ref_train_bpe(wf, 30)
    assert len(got) > 5  # the corpus genuinely yields merges


def test_bpe_encode_matches_sequential_reference(spark):
    df = _docs(spark, CORPUS)
    merges_df = train_bpe(df, num_merges=25, min_freq=1, max_words=1000)
    merges = [(r["left"], r["right"])
              for r in merges_df.orderBy("rank").collect()]
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_encode(df, merges_df).collect()}
    for doc_id, text in CORPUS:
        want = [t for w in _pytokens(text)
                for t in _ref_encode_word(w, merges)]
        assert got[doc_id] == want


def test_bpe_encode_roundtrip_property(spark):
    """Detokenization invariant: joining the pieces and treating </w>
    as a space reconstructs the normalized text exactly."""
    rows = CORPUS + [(9, "  Mixed   CASE\tand\nlines "), (10, ""), (11, None)]
    df = _docs(spark, rows)
    merges = train_bpe(df, num_merges=40, min_freq=1, max_words=1000)
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_encode(df, merges).collect()}
    for doc_id, text in rows:
        if text is None:
            assert got[doc_id] is None
            continue
        norm = " ".join(_pytokens(text))
        joined = "".join(got[doc_id])
        want = (norm + "</w>").replace(" ", "</w>") if norm else ""
        assert joined == want


def test_bpe_unknown_chars_and_early_stop(spark):
    # chars never seen in training still encode (as singletons); a
    # corpus with nothing repeating stops before num_merges
    df = _docs(spark, [(0, "ab ab ab"), (1, "cd cd")])
    merges = train_bpe(df, num_merges=50, min_freq=1, max_words=10)
    assert merges.count() < 50
    out = bpe_encode(_docs(spark, [(0, "xyz ab")]), merges).head()
    toks = out["bpe_tokens"]
    assert "".join(toks) == "xyz</w>ab</w>"


def test_bpe_min_freq_and_max_words_caps(spark):
    df = _docs(spark, [(0, "aa aa bb"), (1, "aa cc")])
    wf = {r["word"]: r["freq"]
          for r in word_frequencies(df, min_freq=2).collect()}
    assert wf == {"aa": 3}
    # max_words keeps the top by (freq desc, word asc): only "aa"
    # (freq 3) trains. Ties at count 3 break lexicographically —
    # ("a","</w>") < ("a","a") — then (a, a</w>) completes the word.
    top = train_bpe(df, num_merges=5, min_freq=1, max_words=1)
    assert [(r["left"], r["right"]) for r in top.orderBy("rank").collect()
            ] == [("a", "</w>"), ("a", "a</w>")]


def test_bpe_empty_corpus_and_validation(spark):
    empty = _docs(spark, []).where("doc_id < 0")
    assert train_bpe(empty, num_merges=5, min_freq=1).count() == 0
    with pytest.raises(ValueError):
        train_bpe(empty, num_merges=0)
    with pytest.raises(ValueError):
        train_bpe(empty, num_merges=5, max_words=0)


def test_bpe_encode_plan_is_narrow(spark):
    """Encoding is a single narrow ArrowEvalPython pass — no Exchange,
    no row-at-a-time PythonUDF."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = spark.createDataFrame(
        [(0, "a", "b")], "rank int, left string, right string")
    plan = bpe_encode(docs, merges)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# quality classifier


def test_quality_classifier_matches_numpy_gd_oracle(spark):
    """Trust only the bucket-hash expression; replicate full-batch GD
    (normalized counts, sigmoid, mean gradient + l2, unregularized
    bias) in numpy and compare weights, bias, and loss history."""
    import numpy as np

    from sparkocr.lm import _gram_buckets, train_quality_classifier

    pos_rows = [(0, "good clean prose here"), (1, "more good clean text")]
    neg_rows = [(0, "spam junk click bait"), (1, "junk spam click spam")]
    nb, iters, lr, l2 = 64, 6, 2.0, 1e-3
    pos = _docs(spark, pos_rows)
    neg = _docs(spark, neg_rows)
    m = train_quality_classifier(pos, neg, n_buckets=nb, n_iters=iters,
                                 lr=lr, l2=l2)

    bs = [r["b"] for r in pos.select(
        _gram_buckets(F.col("text"), nb).alias("b")).collect()]
    bs += [r["b"] for r in neg.select(
        _gram_buckets(F.col("text"), nb).alias("b")).collect()]
    ys = [1.0, 1.0, 0.0, 0.0]
    X = np.zeros((4, nb))
    for i, blist in enumerate(bs):
        for b in blist:
            X[i, b] += 1.0 / len(blist)
    y = np.array(ys)
    w, bias, losses = np.zeros(nb), 0.0, []
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + bias)))
        losses.append(float(np.mean(
            -(y * np.log(np.maximum(p, 1e-12))
              + (1 - y) * np.log(np.maximum(1 - p, 1e-12))))))
        resid = p - y
        w -= lr * (X.T @ resid / len(y) + l2 * w)
        bias -= lr * float(np.mean(resid))

    assert m.bias == pytest.approx(bias, abs=1e-9)
    assert list(m.loss_history) == pytest.approx(losses, abs=1e-9)
    got_w = {r["bucket"]: r["weight"] for r in m.table.collect()}
    for b in np.nonzero(w)[0]:
        assert got_w.get(int(b), 0.0) == pytest.approx(w[b], abs=1e-9)
    for b, v in got_w.items():
        assert v == pytest.approx(w[b], abs=1e-9)


def test_quality_classifier_separates_and_scores_edge_cases(spark):
    from sparkocr.lm import quality_scores, train_quality_classifier

    pos = _docs(spark, [(i, "informative article about science history")
                        for i in range(6)])
    neg = _docs(spark, [(i, "buy cheap pills click casino spam")
                        for i in range(6)])
    m = train_quality_classifier(pos, neg, n_buckets=512, n_iters=15,
                                 lr=5.0)
    assert m.loss_history[-1] < m.loss_history[0]
    test = _docs(spark, [(0, "article about science"),
                         (1, "cheap pills casino"),
                         (2, ""), (3, None)])
    got = {r["doc_id"]: (r["quality"], r["n_feats"])
           for r in quality_scores(test, m).collect()}
    assert got[0][0] > got[1][0]  # positive-like outscores negative-like
    # featureless docs score exactly sigmoid(bias)
    want_empty = round(1.0 / (1.0 + math.exp(-m.bias)), 6)
    assert got[2] == (want_empty, 0)
    assert got[3] == (want_empty, 0)


def test_quality_classifier_validation(spark):
    from sparkocr.lm import train_quality_classifier

    d = _docs(spark, [(0, "a b")])
    empty = _docs(spark, []).where("doc_id < 0")
    with pytest.raises(ValueError):
        train_quality_classifier(d, d, n_iters=0)
    with pytest.raises(ValueError):
        train_quality_classifier(d, d, lr=0.0)
    with pytest.raises(ValueError):
        train_quality_classifier(empty, empty)


def test_quality_scores_plan_shape(spark):
    """Scoring is broadcast-join + one skinny exchange, text never
    shuffles — same contract as perplexity_scores."""
    from sparkocr.lm import QualityClassifier, quality_scores

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    m = QualityClassifier(
        table=spark.createDataFrame([(0, 0.5)], "bucket int, weight double"),
        bias=0.1, n_buckets=64, loss_history=(0.7,))
    plan = quality_scores(docs, m)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    for frag in plan.split("Exchange")[1:]:
        assert "text#" not in frag.split("\n")[0]


# ---------------------------------------------------------------------------
# BPE vocab / keys-format bridge


def test_bpe_vocab_ids_and_keys_roundtrip(spark):
    from sparkocr.keys import load_keys_bytes
    from sparkocr.lm import bpe_encode_ids, bpe_vocab, vocab_to_keys_bytes

    df = _docs(spark, CORPUS)
    merges = train_bpe(df, num_merges=20, min_freq=1, max_words=1000)
    vocab = bpe_vocab(df, merges)
    rows = sorted((r["id"], r["token"]) for r in vocab.collect())
    ids = [i for i, _ in rows]
    toks = [t for _, t in rows]
    # dense ids; base symbols (sorted, incl </w>) before merge products
    assert ids == list(range(len(ids)))
    base_chars = sorted(set("".join(
        t for _, txt in CORPUS for t in _pytokens(txt))) | {"</w>"})
    assert toks[:len(base_chars)] == base_chars
    n_merges = merges.count()
    assert len(toks) == len(base_chars) + n_merges
    got_merge_toks = toks[len(base_chars):]
    want = [r["left"] + r["right"]
            for r in merges.orderBy("rank").collect()]
    assert got_merge_toks == want
    # vocab determinism across runs
    again = sorted((r["id"], r["token"])
                   for r in bpe_vocab(df, merges).collect())
    assert again == rows
    # keys-format round-trip through the package's own loader: the
    # byte format preserves id order line-by-line; load_keys_bytes
    # canonicalizes to a sorted set (its EngineConfig contract), so
    # compare the line order raw and the vocabulary via the loader
    data = vocab_to_keys_bytes(vocab)
    assert data.decode("utf-8").rstrip("\n").split("\n") == toks
    assert list(load_keys_bytes(data)) == sorted(set(toks))

    # encode_ids == encode mapped through the vocab; unknown char → -1
    id_of = dict(zip(toks, ids))
    test = _docs(spark, [(0, "the quick fox"), (1, "ß unknown-char")])
    tok_out = {r["doc_id"]: r["bpe_tokens"]
               for r in __import__("sparkocr.lm", fromlist=["bpe_encode"]
                                   ).bpe_encode(test, merges).collect()}
    id_out = {r["doc_id"]: r["bpe_ids"]
              for r in bpe_encode_ids(test, merges, vocab).collect()}
    for d in (0, 1):
        assert id_out[d] == [id_of.get(t, -1) for t in tok_out[d]]
    assert -1 in id_out[1]  # ß never appeared in training


def test_vocab_to_keys_bytes_rejects_gaps(spark):
    from sparkocr.lm import vocab_to_keys_bytes

    bad = spark.createDataFrame([(0, "a"), (2, "b")],
                                "id int, token string")
    with pytest.raises(ValueError):
        vocab_to_keys_bytes(bad)


def test_incremental_merge_loop_matches_brute_force_recount():
    """_learn_merges (incremental pair counts + pair→word index) must
    produce bit-identical merge sequences to the brute-force
    recount-everything formulation, across randomized word-frequency
    tables — including merge-collision cases (two words rewriting to
    the same symbol tuple)."""
    import random

    from sparkocr.lm import _END, _learn_merges, _merge_word

    def brute(vocab, num_merges):
        merges = []
        for rank in range(num_merges):
            pairs = {}
            for sym, freq in vocab.items():
                for a, b in zip(sym, sym[1:]):
                    pairs[(a, b)] = pairs.get((a, b), 0) + freq
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            if best[1] < 2:
                break
            pair = best[0]
            merges.append((rank, pair[0], pair[1]))
            nxt = {}
            for s, f in vocab.items():
                m = _merge_word(s, pair)
                nxt[m] = nxt.get(m, 0) + f  # collisions accumulate
            vocab = nxt
        return merges

    rng = random.Random(20260817)
    alphabet = "abcdx"
    for trial in range(25):
        n_words = rng.randint(1, 40)
        vocab = {}
        for _ in range(n_words):
            w = "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 8)))
            key = tuple(w) + (_END,)
            vocab[key] = vocab.get(key, 0) + rng.randint(1, 9)
        num_merges = rng.randint(1, 30)
        assert _learn_merges(dict(vocab), num_merges) == \
            brute(dict(vocab), num_merges), f"trial {trial}"


def test_build_corpus_rejects_lm_without_threshold(spark):
    from sparkocr.corpus import build_training_corpus

    docs = spark.createDataFrame(
        [(0, "web", "some text here")],
        "doc_id long, source string, text string")
    lm = train_unigram_lm(docs)
    with pytest.raises(ValueError, match="max_ppl"):
        build_training_corpus(docs, ppl_lm=lm)
