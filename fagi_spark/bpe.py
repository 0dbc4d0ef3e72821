"""Distributed BPE tokenizer training + encoding.

The training-data brief's minimum was a BPE-ish regex token count
(textops.with_token_count); this module is the real thing: learn a
byte-pair-encoding merge table FROM the corpus (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — the
published algorithm every GPT/Llama tokenizer descends from) and apply
it, both as Spark plans.

Scale shape: classic BPE training iterates over the WORD-FREQUENCY
table, not the corpus — one initial groupBy(word) collapses 100 TB of
text into a vocab-sized frame (Heaps' law: ~10^7-10^8 distinct words),
and each merge round is then two narrow operations on that frame:

  1. explode adjacent symbol pairs weighted by word frequency ->
     groupBy(pair) SUM (map-side combine) -> argmax via a 1-row
     TakeOrdered collect (ties broken lexicographically, so training
     is DETERMINISTIC — no hash-order dependence);
  2. a map-only pandas transform that merges the winning pair inside
     each word's symbol sequence (leftmost-first, the reference rule).

The driver holds only the merge list (n_merges tuples) and one scalar
per round; the symbol table stays distributed, localCheckpoint'd every
few rounds to truncate lineage (same pattern as
components.connected_components). Encoding new text is embarrassingly
parallel: one Arrow batch UDF applying the (broadcast) ranked merge
table per word with a per-batch word cache.

Not SQL-expressible (iterative argmax loop; leftmost-first merges have
no single-pass REPLACE equivalent on repeated adjacent symbols), so
correctness is pinned by tests/test_bpe.py: exact parity — merge table
AND encodings — against a pure-Python reference implementation of the
paper's algorithm, plus determinism across partitionings.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import normalize_text

END = "</w>"  # word-end marker, per the paper


def _word_freq(df: DataFrame, text: str) -> DataFrame:
    """(word, freq) over the normalized corpus — the one corpus-sized
    shuffle in training; everything after runs on the vocab frame."""
    w = F.explode(F.split(normalize_text(F.coalesce(F.col(text),
                                                    F.lit(""))), " "))
    return (df.select(w.alias("word")).filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _merge_pair_in_seq(seq: list, a: str, b: str, joined: str) -> list:
    """Leftmost-first single-pair merge inside one symbol sequence."""
    out, i, n = [], 0, len(seq)
    while i < n:
        if i + 1 < n and seq[i] == a and seq[i + 1] == b:
            out.append(joined)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def train_bpe(df: DataFrame, text: str = "text", n_merges: int = 50,
              min_freq: int = 2, checkpoint_every: int = 8,
              sample_words: int | None = None) -> list:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list [(sym_a, sym_b), ...]. Stops early when no pair
    reaches ``min_freq``. Ties on count break by lexicographic pair
    order (deterministic, partition-independent).

    Merge-count ceiling: each round is ONE Spark job over the
    word-frequency frame plus a 1-row collect — inherent to the
    paper's sequential argmax (round r+1's counts depend on round r's
    merge). At n_merges in the tens this is cheap; a production-vocab
    run (30-50k merges) means that many jobs, each rescanning a frame
    of ~10^7-10^8 distinct words. The fix at that scale is shrinking
    the FRAME, not Spark heroics: pass ``sample_words=N`` to train on
    the N highest-frequency words only (deterministic TakeOrdered —
    freq desc, word asc — so results are partition-independent).
    Zipf's law puts nearly all pair mass in the frequency head, and
    any tail word's total influence on a pair count is bounded by its
    own frequency, so a 10^5-word head recovers the same early merge
    table as the full vocab in practice; with N >= |vocab| the merges
    are exactly the full run's (pytest-pinned). Per-round cost then
    drops from vocab-sized to N-sized regardless of corpus size."""
    freqs = _word_freq(df, text)
    if sample_words is not None and sample_words > 0:
        # TakeOrdered (per-partition top-N, then merge) — never a
        # full sort; ties on freq break by word for determinism
        freqs = freqs.orderBy(F.col("freq").desc(), F.col("word").asc()) \
                     .limit(sample_words)
    syms = freqs.select(
        "freq",
        F.concat(F.split(F.col("word"), ""),
                 F.array(F.lit(END))).alias("syms"))
    syms = syms.localCheckpoint()
    merges: list = []
    prev = None
    for r in range(n_merges):
        pairs = syms.select(
            "freq",
            F.explode(F.when(
                F.size("syms") >= 2,
                F.transform(F.sequence(F.lit(0), F.size("syms") - 2),
                            lambda i: F.struct(
                                F.element_at("syms", i + 1).alias("a"),
                                F.element_at("syms", i + 2).alias("b")))
            ).otherwise(F.array().cast(
                "array<struct<a:string,b:string>>"))).alias("p"))
        # NOTE: within-word repeats of a pair count once per occurrence
        # here, including overlapping runs ("aaa" -> (a,a) twice); the
        # paper's counter does the same.
        top = (pairs.groupBy("p.a", "p.b")
               .agg(F.sum("freq").alias("n"))
               .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
               .limit(1).collect())
        if not top or top[0]["n"] < min_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        joined = a + b

        def apply_merge(batches, _a=a, _b=b, _j=joined):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["syms"] = [
                    _merge_pair_in_seq(list(s), _a, _b, _j)
                    for s in pdf["syms"]]
                yield pdf
        new = syms.mapInPandas(apply_merge,
                               "freq bigint, syms array<string>")
        # materialize EVERY round: un-materialized rounds would chain
        # r mapInPandas stages into one task on the next count job —
        # the measured per-worker pipe trap (CLAUDE.md). persist+count
        # keeps one cached copy; the periodic localCheckpoint bounds
        # the recompute chain (on cache eviction) to checkpoint_every
        # rounds and truncates the plan.
        if (r + 1) % checkpoint_every == 0:
            new = new.localCheckpoint()  # eager — cuts lineage
        else:
            new = new.persist()
            new.count()
        if prev is not None:
            try:
                prev.unpersist()  # superseded copy; checkpointed
            except Exception:     # frames no-op here and their blocks
                pass              # are reclaimed by the ContextCleaner
        prev, syms = new, new
    return merges


def encode_word(word: str, ranks: dict) -> list:
    """Apply a ranked merge table to one word: repeatedly merge the
    LOWEST-RANK present pair (leftmost-first within a rank) until no
    learned pair remains — the paper's encode rule."""
    seq = list(word) + [END]
    while len(seq) >= 2:
        best, best_rank = None, None
        for i in range(len(seq) - 1):
            rk = ranks.get((seq[i], seq[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best, best_rank = (seq[i], seq[i + 1]), rk
        if best is None:
            break
        seq = _merge_pair_in_seq(seq, best[0], best[1], best[0] + best[1])
    return seq


def apply_bpe(df: DataFrame, merges: list, key: str = "doc_id",
              text: str = "text") -> DataFrame:
    """Encode ``text`` with a learned merge table. Returns
    (key, bpe_tokens array<string>, n_bpe_tokens) — one row per input
    row, key type preserved from the input schema. One Arrow batch
    UDF; the merge table rides the closure (n_merges tuples — KBs);
    per-batch word memoization amortizes the per-word python loop
    across repeated words. Tokenization is the SAME Spark expression
    training used (normalize_text + split), evaluated JVM-side and
    handed to the UDF as a word array — train and encode cannot
    diverge on normalization by construction."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def enc(batches):
        cache: dict = {}
        for pdf in batches:
            toks, counts = [], []
            for words in pdf["_words"]:
                out: list = []
                for w in words:
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = encode_word(w, ranks)
                        cache[w] = got
                    out.extend(got)
                toks.append(out)
                counts.append(len(out))
            yield pd.DataFrame({key: pdf[key], "bpe_tokens": toks,
                                "n_bpe_tokens": counts})

    key_type = dict(df.dtypes)[key]
    src = df.select(
        key,
        F.split(normalize_text(F.coalesce(F.col(text), F.lit(""))),
                " ").alias("_words"))
    out_schema = (f"{key} {key_type}, bpe_tokens array<string>, "
                  "n_bpe_tokens long")
    return src.mapInPandas(enc, out_schema)
