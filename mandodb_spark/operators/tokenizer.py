"""BPE tokenizer training and encoding over a distributed corpus.

The text operators already *count* tokens (``text.bpe_tokens`` — a fixed
regex pre-tokenizer); a training-data pipeline also needs to *train* the
subword vocabulary on the corpus itself.  The scalable decomposition is
the one production BPE trainers use (the corpus never reaches the merge
loop):

1. **word-frequency table** — one distributed explode + groupBy over the
   corpus: O(corpus) work, but the OUTPUT is vocabulary-sized.  This is
   the only stage that touches the data, and the only shuffle.
2. **merge loop** — classic BPE (Sennrich et al. 2016) over the word-freq
   table: repeatedly merge the most frequent adjacent symbol pair.  Runs
   driver-side over bounded metadata (``max_words`` caps the table at the
   top-frequency words — the same bounded-collect contract as the IVF
   codebook; rare words contribute negligible pair mass).
3. **encode** — apply the learned merges to documents in an Arrow-batched
   ``mapInPandas``: merge ranks broadcast in the closure, per-distinct-word
   memoization inside each batch (Zipf makes the hit rate high).

Determinism: pair selection breaks frequency ties lexicographically, so
the same corpus always yields the same merge list on any cluster layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def word_freqs(df: DataFrame, text_col: str, max_words: int | None = None) -> DataFrame:
    """Distinct whitespace-lowered words with counts — the one corpus-wide
    pass of BPE training.  ``max_words`` keeps the top-N by (freq desc,
    word asc) via a k-bounded sort (TakeOrderedAndProject), making the
    driver collect in :func:`bpe_train` explicitly bounded."""
    wf = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if max_words is not None:
        wf = wf.orderBy(F.col("freq").desc(), F.col("word")).limit(max_words)
    return wf


def _merge_word(symbols: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, merged = 0, pair[0] + pair[1]
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    max_words: int = 200_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.

    One distributed word-count (:func:`word_freqs`, bounded to
    ``max_words``), then the Sennrich merge loop over that table —
    driver-side by design: the word-freq table is bounded metadata, and
    each iteration's pair recount touches only words CONTAINING the
    merged pair (incremental update, not a full rescan).  Ties break
    (freq desc, pair lex asc) so training is reproducible bit-for-bit
    across cluster layouts and engines.
    """
    vocab: dict[tuple[str, ...], int] = {
        tuple(r.word): int(r.freq)
        for r in word_freqs(df, text_col, max_words=max_words).collect()
    }
    # pair counts + reverse index: pair -> words containing it
    from collections import defaultdict

    pair_freq: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set] = defaultdict(set)
    for w, f in vocab.items():
        for a, b in zip(w, w[1:]):
            pair_freq[(a, b)] += f
            pair_words[(a, b)].add(w)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_freq:
            break
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_freq[best] <= 0:
            break
        merges.append(best)
        # re-segment only the words that contain the merged pair
        for w in list(pair_words[best]):
            f = vocab.pop(w)
            for a, b in zip(w, w[1:]):
                pair_freq[(a, b)] -= f
                if pair_freq[(a, b)] <= 0:
                    del pair_freq[(a, b)]
                pair_words[(a, b)].discard(w)
            nw = _merge_word(w, best)
            vocab[nw] = vocab.get(nw, 0) + f
            for a, b in zip(nw, nw[1:]):
                pair_freq[(a, b)] += f
                pair_words[(a, b)].add(nw)
    return merges


def bpe_encode_stats(
    df: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Per-document subword statistics under a trained merge list:
    ``(id, n_words, n_subwords, compression)`` where compression =
    characters per subword (the fertility metric tokenizer evaluations
    report).  One Arrow pass; the merge ranks ride the closure (broadcast
    by Spark's task serialization — vocabulary-sized, same class as the
    PQ codebooks); per-distinct-word memoization inside each batch keeps
    the merge loop off the Zipf head."""
    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> int:
        got = cache.get(word)
        if got is not None:
            return got
        syms = tuple(word)
        while len(syms) > 1:
            best, best_rank = None, None
            for p in zip(syms, syms[1:]):
                r = ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = p, r
            if best is None:
                break
            syms = _merge_word(syms, best)
        cache[word] = len(syms)
        return len(syms)

    def batches(it):
        for pdf in it:
            cache: dict = {}
            n_words, n_sub, n_chars = [], [], []
            for text in pdf[text_col]:
                # NULL text is an empty document, never the string "None"
                words = [] if text is None else [w for w in str(text).lower().split(" ") if w]
                n_words.append(len(words))
                n_sub.append(sum(encode_word(w, cache) for w in words))
                n_chars.append(sum(len(w) for w in words))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_words": n_words,
                    "n_subwords": n_sub,
                    "compression": [
                        round(c / s, 6) if s else None for c, s in zip(n_chars, n_sub)
                    ],
                }
            )

    return (
        df.select(id_col, text_col)
        .mapInPandas(
            batches, "id long, n_words long, n_subwords long, compression double"
        )
        .withColumnRenamed("id", id_col)
    )
