"""BPE tokenizer: deterministic training on hand-computable cases,
greedy segmentation, and the distributed apply path (distinct-word
segmentation + broadcast join-back + in-order reassembly) proven
equal to the driver-side reference composition."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from car_insurance_data_pipeline_spark_spark.operators.tokenizer import (
    bpe_tokenize,
    segment_word,
    train_bpe,
    train_bpe_from_corpus,
)


def test_train_bpe_hand_computed():
    # pairs: (a,b) freq 3+2=5, (b,c) freq 2 → merge (a,b) first;
    # then (ab,c) freq 2 is all that's left
    merges = train_bpe([("ab", 3), ("abc", 2)], n_merges=5)
    assert merges == [("a", "b"), ("ab", "c")]


def test_train_bpe_lexicographic_tie_break():
    # (a,b) and (c,d) both freq 2 → smallest pair merges first
    merges = train_bpe([("ab", 2), ("cd", 2)], n_merges=1)
    assert merges == [("a", "b")]


def test_segment_word_greedy_lowest_rank_first():
    ranks = {("a", "b"): 0, ("ab", "c"): 1}
    assert segment_word("abcab", ranks) == ["abc", "ab"]
    assert segment_word("xyz", ranks) == ["x", "y", "z"]
    assert segment_word("ab", ranks) == ["ab"]


def test_training_stops_below_freq_two():
    # every pair unique → freq 1 → no merges worth making
    assert train_bpe([("abcd", 1)], n_merges=10) == []


def _reference_tokens(text: str, merges) -> list[str]:
    ranks = {p: i for i, p in enumerate(merges)}
    out: list[str] = []
    for w in text.strip().lower().split():
        out.extend(segment_word(w, ranks))
    return out


def test_distributed_apply_equals_reference(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the mat the cat"),
            (3, "a theatre that thematically cats"),
            (4, "   "),  # whitespace-only → no tokens → no row
        ],
        "doc_id long, text string",
    )
    merges = train_bpe_from_corpus(docs, n_merges=20)
    assert merges  # 'th'/'the' style merges exist in this corpus
    got = {
        r.doc_id: list(r.tokens)
        for r in bpe_tokenize(docs, merges).collect()
    }
    assert set(got) == {1, 2, 3}  # doc 4 has no words
    for doc_id, text in [(1, "the cat sat on the mat"),
                         (2, "the mat the cat"),
                         (3, "a theatre that thematically cats")]:
        assert got[doc_id] == _reference_tokens(text, merges)
        # segmentation is lossless: concatenation restores the words
        assert "".join(got[doc_id]) == text.strip().lower().replace(" ", "")


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=8),
        min_size=1,
        max_size=12,
    )
)
def test_segmentation_is_lossless_property(words):
    corpus = {}
    for w in words:
        corpus[w] = corpus.get(w, 0) + 1
    merges = train_bpe(sorted(corpus.items()), n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in corpus:
        assert "".join(segment_word(w, ranks)) == w


def test_fixture_corpus_tokenizes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    merges = train_bpe_from_corpus(docs, n_merges=30)
    toks = bpe_tokenize(docs, merges)
    rows = toks.collect()
    assert 0 < len(rows) <= 200
    # merges actually compress: fewer tokens than characters
    some = rows[0]
    assert 0 < len(some.tokens)


# ---- round-5: q132 oracle-encoding equivalence (property-based) ----
# The q132 oracle reproduces the BPE train+apply loop in SQL via a
# double-space symbol encoding and non-overlapping replace(). That
# equivalence rests on two claims argued in _bpe_tokenize_oracle_sql:
# (1) left-to-right non-overlapping replace == the trainer's greedy
# i+=2 merge, including self-overlapping pairs; (2) applying merges
# exhaustively in learned order == segment_word's rank-priority
# search. This simulates the SQL iteration EXACTLY (str.replace has
# the same non-overlapping left-to-right semantics as DuckDB's
# replace) and hypothesis-compares it against the real trainer +
# segmenter over adversarial small-alphabet word multisets — the
# regime where self-overlap and ties are common.

from collections import Counter as _Counter

from hypothesis import strategies as st

from car_insurance_data_pipeline_spark_spark.operators.tokenizer import (
    train_bpe,
)


def _sql_sim_bpe(word_counts, n_merges):
    """Pure-Python replica of the unrolled SQL iteration."""
    enc = {w: " " + "  ".join(w) + " " for w, _ in word_counts}
    wn = dict(word_counts)
    for _ in range(n_merges):
        stats = _Counter()
        for w, s in enc.items():
            syms = s.strip().split("  ")
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += wn[w]
        cands = [(f, l, r) for (l, r), f in stats.items() if f >= 2]
        if not cands:
            continue  # the SQL no-op LEFT JOIN branch
        # exact SQL ORDER BY freq DESC, l, r LIMIT 1:
        best = sorted(cands, key=lambda t: (-t[0], t[1], t[2]))[0]
        _, l, r = best
        pat, rep = f" {l}  {r} ", f" {l}{r} "
        enc = {w: s.replace(pat, rep) for w, s in enc.items()}
    return {w: s.strip().split("  ") for w, s in enc.items()}


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=8),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=10),
)
def test_sql_replace_iteration_equals_trainer_and_segmenter(words, n_merges):
    from car_insurance_data_pipeline_spark_spark.operators.tokenizer import (
        segment_word,
    )

    counts = sorted(_Counter(words).items())
    sim = _sql_sim_bpe(counts, n_merges)
    merges = train_bpe(counts, n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in counts:
        assert sim[w] == segment_word(w, ranks), (w, merges)
