"""Distributed BPE training/encoding vs a pure-Python reference
implementation of Sennrich et al. 2016 (learn_bpe's counting loop with
deterministic lexicographic tie-breaks)."""

from __future__ import annotations

import re
from collections import Counter

from fagi_spark import bpe


def _ref_word_freq(texts):
    c = Counter()
    for t in texts:
        for w in re.sub(" +", " ", (t or "").lower()).split(" "):
            if w:
                c[w] += 1
    return c


def _ref_train(texts, n_merges, min_freq=2):
    """Reference BPE trainer: pair counts over the word-freq table,
    max by (count, lexicographic pair), leftmost-first merge."""
    vocab = {tuple(list(w) + [bpe.END]): f
             for w, f in _ref_word_freq(texts).items()}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for seq, f in vocab.items():
            for i in range(len(seq) - 1):
                pc[(seq[i], seq[i + 1])] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (a, b), _n = best
        merges.append((a, b))
        vocab = {tuple(bpe._merge_pair_in_seq(list(s), a, b, a + b)): f
                 for s, f in vocab.items()}
    return merges


def _ref_encode(word, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    return bpe.encode_word(word, ranks)


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new new",
]


def test_train_bpe_matches_reference(spark):
    """The distributed trainer learns the exact merge sequence of the
    reference algorithm (same counts, same lexicographic tie-break),
    independent of partitioning."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    want = _ref_train(CORPUS, 12)
    assert len(want) == 12  # corpus is rich enough for all 12 rounds
    got = bpe.train_bpe(df, n_merges=12)
    assert got == want
    got7 = bpe.train_bpe(df.repartition(7), n_merges=12)
    assert got7 == want
    # classic paper example: 'newest' dominates, so 'est</w>' forms
    assert ("es", "t</w>") in got or ("e", "st</w>") in got or \
        ("est", "</w>") in got


def test_train_bpe_sampled_frame_recovers_merges(spark):
    """sample_words: with N >= |vocab| the frequency-head sample IS the
    full vocab, so the merge table is exactly the full run's; a head
    that still covers every word with freq >= 2 also recovers it on
    this fixture (the min_freq floor makes the dropped tail
    uninfluential here: a singleton word contributes < min_freq to any
    pair)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    want = _ref_train(CORPUS, 12)
    # N >= vocab (5 distinct words): exact recovery guaranteed
    assert bpe.train_bpe(df, n_merges=12, sample_words=100) == want
    assert bpe.train_bpe(df, n_merges=12, sample_words=5) == want


def test_train_bpe_min_freq_stops_early(spark):
    df = spark.createDataFrame([(0, "ab ab cd")], "doc_id long, text string")
    got = bpe.train_bpe(df, n_merges=50, min_freq=2)
    # only pairs inside 'ab' (freq 2) qualify; 'cd' pairs have freq 1
    assert 0 < len(got) <= 3
    for a, b in got:
        assert "c" not in a + b and "d" not in a + b


def test_apply_bpe_matches_reference_encode(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    merges = bpe.train_bpe(df, n_merges=10)
    enc = {r.doc_id: (list(r.bpe_tokens), r.n_bpe_tokens)
           for r in bpe.apply_bpe(df, merges).collect()}
    for i, t in enumerate(CORPUS):
        want = []
        for w in t.split(" "):
            want.extend(_ref_encode(w, merges))
        assert enc[i][0] == want, i
        assert enc[i][1] == len(want)
    # unseen words fall back to characters + learned subwords
    new = spark.createDataFrame([(99, "lowest")], "doc_id long, text string")
    out = bpe.apply_bpe(new, merges).collect()[0]
    assert "".join(out.bpe_tokens) == "lowest" + bpe.END


def test_one_at_a_time_equals_full_pass_for_valid_tables():
    """The recursive-CTE oracle of doc_bpe_encode_fixed merges ONE
    leftmost occurrence of the lowest-rank pair per step; encode_word
    merges ALL occurrences of that rank per pass. For any WELL-FORMED
    table (a pair using a merged symbol ranks after the merge that
    created it) the two are identical — checked on random valid tables
    and random words."""
    import random

    from fagi_spark.bpe import END, _merge_pair_in_seq, encode_word

    def one_at_a_time(word, ranks):
        seq = list(word) + [END]
        while True:
            best_rank, best_i = None, None
            for i in range(len(seq) - 1):
                rk = ranks.get((seq[i], seq[i + 1]))
                if rk is not None and (best_rank is None or rk < best_rank):
                    best_rank, best_i = rk, i
            if best_i is None:
                return seq
            seq = (seq[:best_i] + [seq[best_i] + seq[best_i + 1]]
                   + seq[best_i + 2:])

    rng = random.Random(13)
    for trial in range(200):
        # grow a VALID table: each merge pairs two existing symbols
        symbols = list("abcd") + [END]
        merges = []
        for _ in range(rng.randrange(1, 10)):
            a, b = rng.choice(symbols), rng.choice(symbols)
            if (a, b) in merges or a == END:
                continue
            merges.append((a, b))
            symbols.append(a + b)
        ranks = {p: i for i, p in enumerate(merges)}
        word = "".join(rng.choice("abcd") for _ in range(rng.randrange(1, 12)))
        assert one_at_a_time(word, ranks) == encode_word(word, ranks), \
            (word, merges)
