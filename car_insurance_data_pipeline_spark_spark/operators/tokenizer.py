"""BPE tokenizer: training + distributed application.

Completes the tokenizer story q124 opens (q124 = one iteration of
pair counting under the oracle). Real BPE training is inherently
iterative — merge, recount, merge — so, like every production
tokenizer trainer, the LOOP runs in memory over the word-count
table, which is VOCABULARY-bounded, not corpus-bounded: the corpus
reduces to (word, count) distributedly (one shuffle), and only that
table reaches the trainer. Application inverts the same trick: each
DISTINCT word is segmented once (Arrow-batched, vocab-bounded) and
the word→tokens map broadcast-joins back onto the corpus — the
documents themselves never pass through Python.

Scale: at 100 TB both the train and apply paths touch the full
corpus only through (a) the word-count shuffle and (b) the final
broadcast join; everything vocab-sized is explicitly capped
(``max_vocab``) so driver/broadcast memory is bounded by contract.
Natural-language vocabularies grow ~O(corpus^0.5) (Heaps' law), so
the cap holds far past 100 TB; corpora that overflow it need a
df-cut (drop hapax words) first, and the loud error says so.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bpe_word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed (word, wn) table: whitespace words of the
    lower-cased corpus with multiplicities. One exchange (the word
    groupBy); the same normalization q124 oracles."""
    words = docs.select(
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("w")
    ).filter(F.col("w") != "")
    return words.groupBy("w").agg(F.count("*").cast("bigint").alias("wn"))


def train_bpe(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Deterministic BPE training over an in-memory (word, count)
    table: repeatedly merge the most frequent adjacent symbol pair
    (ties broken lexicographically, so results are reproducible
    across runs and partitionings). Pure Python by design — the
    input is vocab-bounded, and each iteration only touches words
    containing the merged pair."""
    from collections import Counter, defaultdict

    seqs: dict[str, list[str]] = {w: list(w) for w, _ in word_counts}
    counts = dict(word_counts)
    merges: list[tuple[str, str]] = []

    def pair_stats():
        stats: Counter = Counter()
        index: defaultdict = defaultdict(set)
        for w, syms in seqs.items():
            wn = counts[w]
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += wn
                index[(a, b)].add(w)
        return stats, index

    stats, index = pair_stats()
    for _ in range(n_merges):
        if not stats:
            break
        best = max(stats.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        # lexicographic tie-break must prefer the SMALLEST pair at
        # equal frequency: invert by re-scanning candidates
        top_freq = best[1]
        best_pair = min(p for p, f in stats.items() if f == top_freq)
        if top_freq < 2:
            break  # nothing left worth merging
        merges.append(best_pair)
        a, b = best_pair
        merged = a + b
        for w in list(index[best_pair]):
            syms = seqs[w]
            wn = counts[w]
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            # decrement old stats, add new
            for pa, pb in zip(syms, syms[1:]):
                stats[(pa, pb)] -= wn
                if stats[(pa, pb)] <= 0:
                    stats.pop((pa, pb), None)
                index[(pa, pb)].discard(w)
            for pa, pb in zip(out, out[1:]):
                stats[(pa, pb)] += wn
                index[(pa, pb)].add(w)
            seqs[w] = out
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word, lowest-rank pair first —
    the standard greedy BPE segmenter."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def train_bpe_from_corpus(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    max_vocab: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Distributed word counting + in-memory training. ``max_vocab``
    bounds what the driver materializes — by contract, not hope."""
    wc = bpe_word_counts(docs, text_col)
    rows = wc.limit(max_vocab + 1).collect()
    if len(rows) > max_vocab:
        raise ValueError(
            f"vocabulary exceeds max_vocab={max_vocab}; df-cut rare "
            "words (e.g. filter wn >= 2) before training"
        )
    pairs = sorted((r.w, r.wn) for r in rows)  # deterministic order
    return train_bpe(pairs, n_merges)


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with a learned merge table: returns
    (id_col, tokens array<string>). Each DISTINCT word is segmented
    once in an Arrow batch (vocab-bounded Python), then the
    word→tokens map broadcast-joins back onto the per-document word
    stream and reassembles in word order — document text never
    crosses the Python boundary."""
    from pyspark.sql.functions import pandas_udf

    spark = docs.sparkSession
    ranks = {p: i for i, p in enumerate(merges)}
    ranks_bc = spark.sparkContext.broadcast(ranks)

    def _seg(words: pd.Series) -> pd.Series:
        r = ranks_bc.value
        return words.map(lambda w: segment_word(w, r))

    seg = pandas_udf(_seg, "array<string>")

    per_word = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("pos", "w"),
    ).filter(F.col("w") != "")
    vocab = per_word.select("w").distinct().select(
        "w", seg("w").alias("toks")
    )
    joined = per_word.join(F.broadcast(vocab), "w")
    return (
        joined.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "toks"))
            ).alias("ordered")
        )
        .select(
            id_col,
            F.flatten(F.col("ordered.toks")).alias("tokens"),
        )
    )
