"""Mirror of the driver's t2 correctness gate: every catalog query
with an oracle must match DuckDB on row-count + schema + values at
sf=0.01. Rows-only queries are smoke-checked for shape/determinism.
"""

from __future__ import annotations

import pytest

from car_insurance_data_pipeline_spark_spark.plans.catalog import specs
from car_insurance_data_pipeline_spark_spark.testing import compare_query

ALL_SPECS = specs()
WITH_ORACLE = sorted(n for n, s in ALL_SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in ALL_SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, sf_dir):
    res = compare_query(name, spark, sf_dir)
    assert res.ok, f"{name}: {res.detail}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    df = ALL_SPECS[name].fn(spark, sf_dir)
    rows = df.count()
    assert rows >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_queries_oracle_keys_align():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30


def test_driver_window_is_all_oracle_bearing():
    """The verification driver hard-checks only the FIRST 50
    registered queries (registration order is part of the contract —
    plans/catalog.py:_PRIORITY). Every slot in that window must carry
    an oracle; a rows-only query inside the window would waste a
    hard-signal slot, and an oracle query pushed past 50 silently
    loses its driver row. Oracle-bearing queries parked beyond the
    window stay covered by the parametrized mirror above."""
    names = list(ALL_SPECS)
    window = names[:50]
    rows_only_in_window = [n for n in window if not ALL_SPECS[n].oracle]
    assert rows_only_in_window == []
    # round-5 rotation (r4 verdict #1+#3): every oracle-bearing query
    # that had never earned a driver row before round 5 must hold a
    # window slot — the 14 round-4 late additions plus the two
    # newly-oracle'd iterative operators (PageRank, BPE tokenize)
    for n in ["q113_pagerank_centrality", "q132_bpe_tokenize",
              "q136_kmeans_clusters", "q137_label_propagation",
              "q138_heavy_hitters",
              "q117_bloom_prefilter_join", "q118_image_decode",
              "q119_audio_decode", "q120_moving_window_range",
              "q121_grouping_sets", "q122_set_operations",
              "q127_dataset_split", "q128_curriculum_bins",
              "q129_rank_profile", "q130_json_extract",
              "q131_map_rollup", "q133_fuzzy_pairs",
              "q134_max_concurrency", "q135_triangle_copurchase"]:
        assert n in window, n
