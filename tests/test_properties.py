"""Property-based tests (hypothesis) for the cleaning/text functions.

Examples are generated per property, then evaluated in ONE Spark job
per property (batched into a single DataFrame) so the JVM round-trip
cost doesn't scale with example count.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.functions.cleaning import (
    currency_to_double,
    parse_date_multi,
)
from car_insurance_data_pipeline_spark_spark.functions.text import (
    fingerprint,
    token_count,
    word_shingles,
)

N = 80  # examples per property


def _eval(spark, rows, schema, col):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(col).collect()]


amounts = st.decimals(
    min_value="-99999.99", max_value="99999.99", places=2
).map(str)
styles = st.sampled_from(["{}€", "€{}", "${}", "{}", " {} "])


@settings(max_examples=1, deadline=None)
@given(st.lists(st.tuples(amounts, styles), min_size=N, max_size=N))
def test_currency_roundtrip(spark, pairs):
    """Any 2-decimal amount survives tagging with any currency style:
    clean(style.format(amount)) == float(amount)."""
    rows = [(style.format(amt),) for amt, style in pairs]
    out = _eval(spark, rows, "dirty string", currency_to_double("dirty"))
    for (amt, style), got in zip(pairs, out):
        assert got is not None and math.isclose(got, float(amt)), (amt, style, got)


dates = st.dates(min_value=dt.date(1900, 1, 1), max_value=dt.date(2099, 12, 31))
fmts = st.sampled_from(["%Y-%m-%d", "%m/%d/%Y", "%d-%m-%Y"])


@settings(max_examples=1, deadline=None)
@given(st.lists(st.tuples(dates, fmts), min_size=N, max_size=N))
def test_multiformat_date_roundtrip(spark, pairs):
    """Any date formatted in any of the three supported formats
    parses back to itself (LIKE dispatch is unambiguous because
    dd-MM-yyyy and MM/dd/yyyy use distinct separators)."""
    rows = [(d.strftime(f),) for d, f in pairs]
    out = _eval(spark, rows, "dirty string", parse_date_multi("dirty"))
    for (d, f), got in zip(pairs, out):
        assert got == d, (d, f, got)


words = st.text(alphabet="abcdefg", min_size=1, max_size=6)
texts = st.lists(words, min_size=0, max_size=30).map(" ".join)


@settings(max_examples=1, deadline=None)
@given(st.lists(texts, min_size=N, max_size=N))
def test_token_and_shingle_counts(spark, docs):
    """#shingles == max(0, #tokens - k + 1) for every document."""
    rows = [(t,) for t in docs]
    toks = _eval(spark, rows, "t string", token_count("t"))
    shs = _eval(spark, rows, "t string", F.size(word_shingles("t", 3)))
    for t, n_tok, n_sh in zip(docs, toks, shs):
        expect = len(t.split())
        assert n_tok == expect
        assert n_sh == max(0, expect - 2)


noise = st.sampled_from(["  ", " ", ",", "!", ".", "?", ";"])


@settings(max_examples=1, deadline=None)
@given(st.lists(st.tuples(texts, noise, noise), min_size=N, max_size=N))
def test_fingerprint_invariant_under_noise(spark, triples):
    """fingerprint(text) is invariant under case, extra whitespace,
    and punctuation insertion."""
    rows = []
    for t, n1, n2 in triples:
        rows.append((t, (n1 + t.upper() + n2).replace(" ", "  ")))
    df_rows = [(a, b) for a, b in rows]
    df = [(a,) for a, _ in df_rows], [(b,) for _, b in df_rows]
    fa = _eval(spark, df[0], "t string", fingerprint("t"))
    fb = _eval(spark, df[1], "t string", fingerprint("t"))
    assert fa == fb
