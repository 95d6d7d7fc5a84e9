"""Pipeline-parity tests: the reference workflow (clean → dims →
facts → risk → analytics) on synthesized dirty fixtures
(FIXTURES.md §B), including the documented compat modes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from car_insurance_data_pipeline_spark_spark.operators.dq import (
    ValidationRules,
    validate,
)
from car_insurance_data_pipeline_spark_spark.plans import insurance as ins
from car_insurance_data_pipeline_spark_spark.sources.readers import read_csv

from tests import fixtures as fx


@pytest.fixture(scope="module")
def raw(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("insurance_raw")
    fx.contracts_csv(f"{d}/contracts.csv")
    fx.vehicles_csv(f"{d}/vehicles.csv")
    fx.claims_csv(f"{d}/claims.csv")
    fx.telematics_csv(f"{d}/telematics.csv")
    fx.device_mapping_csv(f"{d}/device_mapping.csv")
    return {
        name: read_csv(spark, f"{d}/{name}.csv")
        for name in ["contracts", "vehicles", "claims", "telematics", "device_mapping"]
    }


@pytest.fixture(scope="module")
def cleaned(raw):
    return {
        "contracts": ins.clean_contracts(raw["contracts"]).cache(),
        "vehicles": ins.clean_vehicles(raw["vehicles"]).cache(),
        "claims": ins.clean_claims(raw["claims"]).cache(),
        "telematics": ins.clean_telematics(raw["telematics"]).cache(),
    }


def test_ingest_drops_all_null_rows(raw):
    # fixture writes 200 real rows + 2 fully-empty rows
    assert raw["contracts"].count() == 200


def test_ingest_raw_stages_parquet(spark, tmp_path):
    d = tmp_path / "raw"
    d.mkdir()
    fx.contracts_csv(f"{d}/contracts.csv")
    fx.claims_csv(f"{d}/claims.csv")
    staged = ins.ingest_raw(
        spark, str(d), str(tmp_path / "staged"),
        {"contracts.csv": "contracts", "claims.csv": "claims"},
    )
    assert set(staged) == {"contracts", "claims"}
    assert staged["contracts"].count() == 200
    # schema-on-read: staged columns remain strings for the cleaners
    assert all(f.dataType.simpleString() == "string"
               for f in staged["claims"].schema.fields)


def test_clean_contracts_currency_and_negatives(cleaned):
    c = cleaned["contracts"]
    # default mode: every premium parses; negatives coerced to 0
    assert c.filter(F.col("annual_premium").isNull()).count() == 0
    assert c.filter(F.col("annual_premium") < 0).count() == 0
    # $-premiums retain value in default mode (reference zeroes them)
    assert c.filter(F.col("annual_premium") > 0).count() >= 140


def test_clean_contracts_compat_zeroes_dollar_premiums(raw):
    default = ins.clean_contracts(raw["contracts"])
    compat = ins.clean_contracts(raw["contracts"], compat=True)
    d_zero = default.filter(F.col("annual_premium") == 0).count()
    c_zero = compat.filter(F.col("annual_premium") == 0).count()
    # compat zeroes $-rows on top of the negative rows
    assert c_zero > d_zero


def test_clean_contracts_dates_and_names(cleaned):
    c = cleaned["contracts"]
    assert c.filter(F.col("start_date").isNull()).count() == 0
    assert c.filter(F.col("end_date").isNull()).count() == 0
    # single-token names: first == last (substring_index semantics)
    one_tok = c.filter(~F.col("first_name").contains(" ")).filter(
        F.col("first_name") == F.col("last_name")
    )
    assert one_tok.count() > 0


def test_clean_contracts_gender_normalized(cleaned):
    vals = {
        r[0]
        for r in cleaned["contracts"].select("gender").distinct().collect()
    }
    assert vals <= {"F", "M", None}


def test_clean_vehicles_units_and_fills(cleaned):
    v = cleaned["vehicles"]
    row = v.agg(
        F.sum(F.col("horsepower").isNull().cast("int")).alias("hp_null"),
        F.min("horsepower").alias("hp_min"),
        F.max("horsepower").alias("hp_max"),
        F.min("market_value").alias("mv_min"),
    ).collect()[0]
    assert row.hp_null == 0
    assert row.hp_min >= 0 and row.hp_max <= 300
    assert row.mv_min >= 0.0


def test_clean_claims_compat_strays_null(raw):
    default = ins.clean_claims(raw["claims"])
    compat = ins.clean_claims(raw["claims"], compat=True)
    assert default.filter(F.col("occurrence_date").isNull()).count() == 0
    # the stray MM/dd/yyyy rows parse to NULL in compat mode (F5)
    assert compat.filter(F.col("occurrence_date").isNull()).count() > 0


def test_clean_telematics_gps_split(cleaned):
    t = cleaned["telematics"]
    pos = t.filter(F.col("variable") == "POSITION")
    assert pos.filter(F.col("latitude").isNull()).count() == 0
    assert pos.filter(F.col("longitude").isNull()).count() == 0
    nonpos = t.filter(F.col("variable") != "POSITION")
    assert nonpos.filter(F.col("latitude").isNotNull()).count() == 0
    assert nonpos.filter(F.col("sensor_value").isNull()).count() == 0


def test_dimensions(spark, cleaned):
    dc = ins.build_dim_customer(cleaned["contracts"])
    dp = ins.build_dim_policy(cleaned["contracts"])
    assert dc.count() == dc.select("customer_key").distinct().count()
    assert dp.count() == dp.select("policy_key").distinct().count()
    dd = ins.build_dim_date(spark)  # 2020-01-01..2030-12-31
    assert dd.count() == 4018  # reference's range (04:146-147)


def test_fact_policy_snapshot(cleaned):
    dc = ins.build_dim_customer(cleaned["contracts"])
    dp = ins.build_dim_policy(cleaned["contracts"])
    fact = ins.build_fact_policy_snapshot(cleaned["contracts"], dc, dp)
    assert fact.count() == cleaned["contracts"].count()
    # premium preserved through the star build
    src = cleaned["contracts"].agg(
        F.sum(F.col("annual_premium").try_cast("decimal(27,6)")).alias("s")
    ).collect()[0].s
    dst = fact.agg(
        F.sum(F.col("total_premium").try_cast("decimal(27,6)")).alias("s")
    ).collect()[0].s
    assert src == dst


def test_fact_claims_key_fix(cleaned):
    """The reference's J4 join (contract_id == policy_key) yields 0
    rows; the fixed NK join yields one fact row per claim with a
    known contract."""
    dp = ins.build_dim_policy(cleaned["contracts"])
    fact = ins.build_fact_claims(cleaned["claims"], cleaned["contracts"], dp)
    n_claims = cleaned["claims"].count()
    assert fact.count() == n_claims
    assert fact.filter(F.col("policy_key").isNull()).count() == 0


def test_driver_risk(spark, cleaned, raw):
    dc = ins.build_dim_customer(cleaned["contracts"])
    # mapping targets CLI_000000.. which exist in contracts
    risk = ins.build_driver_risk(cleaned["telematics"], raw["device_mapping"], dc)
    rows = risk.collect()
    assert len(rows) == 3  # all three devices mapped
    for r in rows:
        assert 0.0 <= r.driver_risk_score <= 100.0
        assert r.risk_category in {"SAFE", "MODERATE", "RISKY", "VERY_RISKY"}
        assert r.max_speed < ins.IMPOSSIBLE_KMH  # impossible speeds filtered
    assert any(r.speeding_incidents > 0 for r in rows)  # fast band present


def test_analytics(spark, cleaned):
    dc = ins.build_dim_customer(cleaned["contracts"])
    dp = ins.build_dim_policy(cleaned["contracts"])
    dd = ins.build_dim_date(spark)
    fact = ins.build_fact_policy_snapshot(cleaned["contracts"], dc, dp).cache()
    trend = ins.monthly_premium_trend(fact, dd)
    seg = ins.segment_analysis(fact, dc)
    total = fact.agg(F.sum("policy_count")).collect()[0][0]
    assert trend.agg(F.sum("total_policies")).collect()[0][0] == total
    assert seg.agg(F.sum("total_policies")).collect()[0][0] == total
    # ranked descending
    prem = [r.total_premium for r in seg.collect()]
    assert prem == sorted(prem, reverse=True)


def test_dq_validate(cleaned):
    report = validate(
        cleaned["contracts"],
        ValidationRules(
            min_rows=10,
            not_null=["contract_id", "client_id"],
            positive=["annual_premium"],
            stats=["annual_premium"],
        ),
    )
    rows = {(r.check, r.metric): r.status for r in report.collect()}
    assert rows[("row_count", "rows")] == "OK"
    assert rows[("not_null", "contract_id")] == "OK"
    assert rows[("non_negative", "annual_premium")] == "OK"


def test_run_pipeline_end_to_end(spark, tmp_path):
    """The whole workflow as one driver program: every layer
    materialized, keys consistent across the star schema."""
    d = tmp_path / "raw"
    d.mkdir()
    fx.contracts_csv(f"{d}/contracts.csv")
    fx.vehicles_csv(f"{d}/vehicles.csv")
    fx.claims_csv(f"{d}/claims.csv")
    fx.telematics_csv(f"{d}/telematics.csv")
    fx.device_mapping_csv(f"{d}/device_mapping.csv")
    out = ins.run_pipeline(spark, str(d), str(tmp_path / "wh"))
    assert out["fact_policy_snapshot"].count() == out["contracts"].count() == 200
    assert out["fact_claims"].count() == out["claims"].count()
    assert out["fact_driver_risk"].count() == 3
    # referential integrity: every fact FK resolves in its dim
    fk = out["fact_policy_snapshot"].join(
        out["dim_policy"], ["policy_key"], "left_anti"
    )
    assert fk.count() == 0
    assert (tmp_path / "wh" / "dim_customer.parquet").exists()


def test_column_profile_semantics(spark):
    """Typed min/max (not lexicographic), null and distinct counts,
    and the approx path returning sane estimates."""
    from car_insurance_data_pipeline_spark_spark.operators.dq import column_profile

    df = spark.createDataFrame(
        [(999, "b"), (1499, None), (7, "a"), (7, "b")], ["k", "s"]
    )
    prof = {r.column: r for r in column_profile(df, ["k", "s"]).collect()}
    assert prof["k"].min_str == "7" and prof["k"].max_str == "1499"
    assert prof["k"].n_distinct == 3 and prof["k"].n_nulls == 0
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
    assert prof["s"].min_str == "a" and prof["s"].max_str == "b"
    approx = {
        r.column: r
        for r in column_profile(df, ["k"], exact_distinct=False).collect()
    }
    assert 2 <= approx["k"].n_distinct <= 4  # HLL estimate of 3


def test_column_profile_plan_single_pass(spark, sf_dir):
    """The exact profiler must stay ONE aggregation over one scan
    (Expand for the multi-distinct), with no join or union of
    per-column subplans."""
    from car_insurance_data_pipeline_spark_spark.operators.dq import column_profile
    from car_insurance_data_pipeline_spark_spark.plans.catalog import table

    df = column_profile(
        table(spark, sf_dir, "lineitem"), ["l_linenumber", "l_returnflag"]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") + plan.count("Scan parquet") <= 2  # one scan (AQE may print it twice)
    assert "Join" not in plan and "Union" not in plan
    approx_plan = (
        column_profile(
            table(spark, sf_dir, "lineitem"),
            ["l_linenumber", "l_returnflag"],
            exact_distinct=False,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in approx_plan  # the 100 TB path avoids input x n_cols


def test_referential_integrity_orphans(spark):
    from car_insurance_data_pipeline_spark_spark.operators.dq import (
        referential_integrity,
    )

    child = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "fk int"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    out = referential_integrity([(child, "fk", parent, "pk", "c->p")]).collect()
    assert len(out) == 1
    r = out[0]
    # the NULL fk is excluded by contract; 99 is the one orphan
    assert r.n_children == 3 and r.n_orphans == 1 and r.ok == 0


def test_histogram_int_clamp_null_empty_bins(spark):
    from car_insurance_data_pipeline_spark_spark.operators.dq import histogram_int

    df = spark.createDataFrame(
        [(-5,), (0,), (99,), (100,), (250,), (10**6,), (None,)], "x int"
    )
    out = {r.bin: r for r in histogram_int(df, "x", lo=0, width=100, n_bins=3).collect()}
    assert len(out) == 3  # fixed shape, empty bins included
    # -5 clamps into bin 0; NULL dropped; 10**6 clamps into top bin
    assert out[0].n == 3 and out[1].n == 1 and out[2].n == 2
    assert out[1].lo_edge == 100 and out[1].hi_edge == 200


def test_histogram_int_quoted_column_name(spark):
    from car_insurance_data_pipeline_spark_spark.operators.dq import histogram_int

    df = spark.createDataFrame([(50,), (150,)], ["n-chars"])
    out = {r.bin: r.n for r in histogram_int(df, "n-chars", 0, 100, 2).collect()}
    assert out == {0: 1, 1: 1}


def test_udtf_chunker_null_and_empty_text(spark):
    """NULL text contributes ZERO rows (oracle: range(0, NULL) is
    empty); empty/whitespace text contributes one '' chunk (oracle:
    split('') -> [''])."""
    from car_insurance_data_pipeline_spark_spark.plans.udfops import _chunk_udtf

    spark.udtf.register("chunk_splitter_test", _chunk_udtf())
    spark.createDataFrame(
        [(1, None), (2, ""), (3, "  "), (4, "a b c")], ["doc_id", "text"]
    ).createOrReplaceTempView("__udtf_nulltest")
    try:
        rows = spark.sql(
            "SELECT d.doc_id, c.chunk_idx, c.chunk FROM __udtf_nulltest d, "
            "LATERAL chunk_splitter_test(d.text, 2) c"
        ).collect()
    finally:
        spark.catalog.dropTempView("__udtf_nulltest")
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk))
    assert 1 not in by_doc
    assert by_doc[2] == [(0, "")] and by_doc[3] == [(0, "")]
    assert sorted(by_doc[4]) == [(0, "a b"), (1, "c")]
