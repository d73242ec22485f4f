"""[ext] Byte-pair-encoding tokenizer: sample-trained merges, distributed
Arrow-batched apply (SURVEY §2.14 text analysis — the step past the
BPE-ish regex pre-tokenizer in :mod:`functions.text`).

Production shape (and the 100 TB reasoning):
- TRAIN on a bounded, deterministically-sampled slice on the driver —
  tokenizer training is sublinear-value in corpus size (GPT-2's BPE was
  trained once on a fixed corpus; every practical pipeline trains on a
  sample), so shipping the corpus through a distributed trainer buys
  nothing. The sample aggregation (word frequencies) IS distributed; only
  the merge loop (vocab_size iterations over a dict that fits in cache)
  runs locally.
- APPLY distributed: merges broadcast as a rank dict inside an
  Arrow-batched pandas UDF (``mapInPandas``-class path, never
  row-at-a-time Python), one narrow pass per document.

The algorithm is the public BPE formulation (Sennrich et al. 2016,
arXiv:1508.07909; GPT-2's byte-level variant simplifies to this on
lowercased word tokens). The reference repo has no tokenizer code.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qcardia_data_spark.functions.text import word_tokens

END = "</w>"  # end-of-word marker (keeps merges from crossing words)


def bpe_word_freqs(
    docs: DataFrame, text_col: str, sample_docs: int | None = 1000,
    id_col: str | None = None,
) -> dict[str, int]:
    """Distributed word-frequency count feeding the trainer: explode the
    regex word tokens, one groupBy, collect the (bounded) vocabulary.
    ``sample_docs`` keeps the training slice deterministic: the first N
    docs by ``id_col`` order (tokenizer training is sample-based by
    design — see module docstring)."""
    d = docs
    if sample_docs is not None and id_col is not None:
        d = d.orderBy(id_col).limit(sample_docs)
    rows = (
        d.select(F.explode(word_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r["w"]: int(r["n"]) for r in rows}


def bpe_train(freqs: dict[str, int], n_merges: int = 256) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency dict: repeatedly
    merge the most frequent adjacent symbol pair (ties broken
    lexicographically — fully deterministic), up to ``n_merges`` merges."""
    words: dict[tuple[str, ...], int] = {
        tuple(w) + (END,): n for w, n in freqs.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # tie-break: highest count, then lexicographically SMALLEST pair
        top = max(pairs.values())
        best_pair = min(p for p, n in pairs.items() if n == top)
        if top < 2:
            break  # nothing left worth merging
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        new_words: dict[tuple[str, ...], int] = {}
        for sym, n in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + n
        words = new_words
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge of one word (the GPT-2 apply loop)."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]],
    out: str = "bpe_tokens",
) -> DataFrame:
    """``df`` + array<string> column ``out``: BPE tokens of the regex word
    tokens under ``merges``. Arrow-batched pandas UDF — the merges ride
    into every task as one broadcast closure; per-row work is O(len)."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def _enc(words: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_doc(ws):
            toks: list[str] = []
            if ws is None:
                return toks
            for w in ws:
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, ranks)
                toks.extend(got)
            return toks

        return words.map(enc_doc)

    return df.withColumn(out, _enc(word_tokens(F.col(text_col))))


def bpe_vocab(merges: list[tuple[str, str]], freqs: dict[str, int]) -> set[str]:
    """The closed vocabulary implied by (alphabet of the training words ∪
    merge products) — membership check for the invariant oracle."""
    vocab = {END}
    for w in freqs:
        vocab.update(w)
    for a, b in merges:
        vocab.add(a + b)
    return vocab
