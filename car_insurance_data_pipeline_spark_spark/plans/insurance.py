"""Insurance pipeline parity (SURVEY.md §7 Phase 2).

The reference's 11 numbered scripts re-expressed as composable engine
programs: clean → dimensional model → facts → risk scoring →
analytics. Citations point at /root/reference file:line for parity
checking; deviations are documented where the reference's behavior
is a bug (SURVEY §2.3 J4, §2.8 F2/F5).

Scale stance: every join against a dimension is broadcast; facts
never shuffle for dim lookups; surrogate keys default to hash-based
(operators/keys.py) instead of the reference's unpartitioned global
row_number (04_load_dimension_tables.py:118-123).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from car_insurance_data_pipeline_spark_spark.functions.cleaning import (
    currency_to_double,
    name_first,
    name_last,
    normalize_category,
    null_or_negative_to,
    parse_date_multi,
    split_packed_gps,
    strip_unit_to_int,
)
from car_insurance_data_pipeline_spark_spark.functions.dates import (
    date_dimension,
    from_unix_millis,
    yyyymmdd_key,
)
from car_insurance_data_pipeline_spark_spark.functions.geo import haversine_km, speed_kmh
from car_insurance_data_pipeline_spark_spark.operators.keys import surrogate_key_hash

# Risk thresholds (08_load_driver_risk_scores.py:50-52)
SPEEDING_KMH = 110.0
IMPOSSIBLE_KMH = 160.0


# --------------------------------------------------------------------------
# Ingestion layer (script 01) — raw CSV → staged Parquet, Spark-native
# --------------------------------------------------------------------------

# 01_ingest_csv_to_parquet.py:24-33 FILE_MAP equivalent
DEFAULT_FILE_MAP = {
    "contracts.csv": "contracts",
    "vehicles.csv": "vehicles",
    "claims.csv": "claims",
    "telematics.csv": "telematics_raw",
    "device_mapping.csv": "device_mapping",
}


def ingest_raw(
    spark: SparkSession,
    raw_dir: str,
    staged_dir: str,
    file_map: dict[str, str] | None = None,
) -> dict[str, DataFrame]:
    """Stage raw CSVs as Parquet (01_ingest_csv_to_parquet.py
    re-expressed in Spark — the reference stages through
    single-process pandas, 01:46,65). All columns stay strings
    (schema-on-read; explicit casts happen in the cleaners), fully
    empty rows are dropped (01:56), and each table writes as
    overwrite-mode Parquet. Returns the staged DataFrames.
    """
    from car_insurance_data_pipeline_spark_spark.sources.readers import read_csv
    from car_insurance_data_pipeline_spark_spark.sources.writers import write_parquet

    out: dict[str, DataFrame] = {}
    for fname, tname in (file_map or DEFAULT_FILE_MAP).items():
        df = read_csv(spark, f"{raw_dir}/{fname}")
        write_parquet(df, f"{staged_dir}/{tname}.parquet")
        out[tname] = spark.read.parquet(f"{staged_dir}/{tname}.parquet")
    return out


# --------------------------------------------------------------------------
# Cleaning layer (scripts 02/03)
# --------------------------------------------------------------------------


def clean_contracts(
    df: DataFrame, load_date: str = "2024-01-01", compat: bool = False
) -> DataFrame:
    """Contracts cleaner — 02_clean_contracts_data.py:43-92.

    ``compat=True`` reproduces the reference's euro-only currency
    strip ('$...' → NULL → 0.0). Date parsing always uses the
    engine's three-format superset — a documented deviation: the
    reference's contracts cleaner (02:60-65) handles ISO and
    MM/dd/yyyy only, so its behavior on dd-MM-yyyy strings (NULL) is
    not reproduced here; the claims cleaner's subset IS reproduced
    via clean_claims(compat=True).
    """
    premium = currency_to_double("annual_premium", compat_euro_only=compat)
    return df.select(
        F.col("contract_id"),
        F.col("client_id"),
        name_first("client_name").alias("first_name"),
        name_last("client_name").alias("last_name"),
        F.col("product").alias("product_type"),
        parse_date_multi("start_date").alias("start_date"),
        parse_date_multi("end_date").alias("end_date"),
        null_or_negative_to(premium, 0.0).alias("annual_premium"),
        F.col("status").alias("contract_status"),
        F.col("city_postal"),
        F.col("risk_zone"),
        F.col("client_age").try_cast("double").try_cast("int").alias("client_age"),
        F.col("channel").alias("sales_channel"),
        F.col("csp"),
        normalize_category(
            "gender", {"Female": "F", "Male": "M"}
        ).alias("gender"),
        F.lit(load_date).cast("date").alias("load_date"),
    )


def clean_vehicles(df: DataFrame) -> DataFrame:
    """Vehicles cleaner — 03_clean_multisource_data.py:84-110."""
    out = df.select(
        F.col("contract_id"),
        F.col("brand"),
        F.col("model"),
        F.col("year").try_cast("double").try_cast("int").alias("year"),
        strip_unit_to_int("power").alias("horsepower"),
        F.col("fuel_type"),
        currency_to_double("current_value").alias("market_value"),
        F.col("color"),
        F.col("usage"),
        F.col("previous_claims")
        .try_cast("double")
        .try_cast("int")
        .alias("previous_claims"),
    )
    return out.fillna(
        {"year": 0, "horsepower": 0, "market_value": 0.0, "previous_claims": 0}
    )


def clean_claims(df: DataFrame, compat: bool = False) -> DataFrame:
    """Claims cleaner — 03_clean_multisource_data.py:167-180.

    ``compat=True`` drops the MM/dd/yyyy branch (the reference parses
    those occurrence dates to NULL — SURVEY §2.8 F5).
    """
    return df.select(
        F.col("claim_id"),
        F.col("contract_id"),
        parse_date_multi("occurrence_date", compat_reference=compat).alias(
            "occurrence_date"
        ),
        parse_date_multi("declaration_date").alias("declaration_date"),
        F.col("claim_type"),
        currency_to_double("damage_amount").alias("damage_amount"),
        F.coalesce(currency_to_double("indemnified_amount"), F.lit(0.0)).alias(
            "indemnified_amount"
        ),
        F.col("status"),
        F.col("expert_id"),
        F.col("liability"),
    )


def clean_telematics(df: DataFrame) -> DataFrame:
    """Telematics cleaner — 03_clean_multisource_data.py:229-258.

    Unix-ms → timestamp; the polymorphic ``value`` column splits into
    GPS lat/lon/alt when variable == 'POSITION', numeric value
    otherwise.
    """
    lat, lon, alt = split_packed_gps("value")
    is_pos = F.col("variable") == "POSITION"
    # The 0.0 default (03:253-258) applies only to sensor rows —
    # POSITION rows keep sensor_value NULL so consumers can tell
    # "no reading" from "reading of 0".
    sensor = F.when(~is_pos, F.coalesce(F.col("value").try_cast("double"), F.lit(0.0)))
    return df.select(
        F.col("deviceId"),
        from_unix_millis("timeMili").alias("event_time"),
        F.col("variable"),
        F.col("alarmClass").try_cast("int").alias("alarmClass"),
        sensor.alias("sensor_value"),
        F.when(is_pos, lat).alias("latitude"),
        F.when(is_pos, lon).alias("longitude"),
        F.when(is_pos, alt).alias("altitude"),
    )


# --------------------------------------------------------------------------
# Dimensional model (script 04)
# --------------------------------------------------------------------------


def build_dim_customer(contracts: DataFrame) -> DataFrame:
    """dim_customer — 04_load_dimension_tables.py:93-102 + dedup on
    the natural key (deterministic survivor, unlike the reference's
    dropDuplicates at 04:69)."""
    w = Window.partitionBy("client_id").orderBy("contract_id")
    return (
        contracts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("client_id").alias("customer_key"),
            "first_name",
            "last_name",
            F.col("client_age").alias("age"),
            "gender",
            "city_postal",
            F.col("csp").alias("segment"),
            "load_date",
        )
    )


def build_dim_policy(contracts: DataFrame) -> DataFrame:
    """dim_policy — 04_load_dimension_tables.py:116-134, with the
    scalable SK deviation: the reference's surrogate key is
    row_number over an UNPARTITIONED window (04:118-123, a
    single-task funnel at scale); ours is a stable hash of the
    natural key (same NK → same SK across loads)."""
    dedup = contracts.dropDuplicates(["contract_id"])
    return surrogate_key_hash(dedup, ["contract_id"], "policy_key").select(
        "policy_key",
        F.col("contract_id"),
        "product_type",
        "risk_zone",
        "sales_channel",
        "contract_status",
        "load_date",
    )


def build_dim_date(
    spark: SparkSession, start: str = "2020-01-01", end: str = "2030-12-31"
) -> DataFrame:
    """dim_date — 04_load_dimension_tables.py:146-180 (same range)."""
    return date_dimension(spark, start, end)


# --------------------------------------------------------------------------
# Facts (scripts 05/07)
# --------------------------------------------------------------------------


def build_fact_policy_snapshot(
    contracts: DataFrame, dim_customer: DataFrame, dim_policy: DataFrame
) -> DataFrame:
    """fact_policy_snapshot — 05_load_fact_tables.py:93-140.

    Joins J1 (customer) + J2 (policy) + J3 (date key). Neither dim
    carries a broadcast hint (both are one row per customer/contract
    — they scale with the business; the round-9 broadcast-guard
    invariant): AQE broadcasts them while they fit so the contract
    fact never shuffles at dimension-like sizes, and falls back
    cleanly past the threshold.
    """
    c = contracts.withColumn("customer_key", F.col("client_id"))
    with_cust = c.join(
        dim_customer.select("customer_key"), ["customer_key"], "inner"
    )
    with_pol = with_cust.join(
        # dim_policy is one row per contract — corpus-scaling, so no
        # hint (AQE broadcasts while it fits)
        dim_policy.select("policy_key", "contract_id"),
        ["contract_id"],
        "inner",
    )
    return with_pol.select(
        "customer_key",
        "policy_key",
        yyyymmdd_key(F.col("load_date")).alias("load_date_key"),
        F.lit(1).alias("policy_count"),
        F.col("annual_premium").alias("total_premium"),
    )


def build_fact_claims(
    claims: DataFrame, contracts: DataFrame, dim_policy: DataFrame
) -> DataFrame:
    """fact_claims — 07_load_fact_claims.py:88-140, key bug fixed.

    DOCUMENTED DEVIATION (SURVEY §2.3 J4): the reference joins
    claims.contract_id == fact.policy_key (string NK vs int SK,
    07:86-89) which matches zero rows on its own data. We join claims
    → dim_policy on the contract NK to fetch the true SK, and fetch
    customer_key through the contracts mapping.
    """
    cust_map = contracts.select(
        "contract_id", F.col("client_id").alias("customer_key")
    ).dropDuplicates(["contract_id"])  # contracts may carry dup rows (same
    # dirty-data condition build_dim_policy dedups); keep the join 1:1 so
    # claims never fan out
    out = (
        # no hints: dim_policy/cust_map are one row per CONTRACT —
        # they scale with the book of business (the broadcast-guard
        # invariant); AQE broadcasts them while small
        claims.join(dim_policy.select("policy_key", "contract_id"),
                    ["contract_id"], "inner")
        .join(cust_map, ["contract_id"], "inner")
    )
    return out.select(
        "customer_key",
        "policy_key",
        yyyymmdd_key(F.col("occurrence_date")).alias("claim_date_key"),
        F.col("claim_id"),
        F.col("damage_amount").try_cast("decimal(18,2)").alias("claim_amount"),
        F.col("status").alias("claim_status"),
        "claim_type",
        "liability",
    )


# --------------------------------------------------------------------------
# Driver risk scoring (script 08)
# --------------------------------------------------------------------------


def build_driver_risk(
    telematics: DataFrame,
    device_mapping: DataFrame,
    dim_customer: DataFrame,
) -> DataFrame:
    """fact_driver_risk — the full 08_load_driver_risk_scores.py
    pipeline: POSITION filter (08:193) → per-device lag of
    (lat, lon, t) (08:208-221) → haversine + speed (08:225-248) →
    impossible-speed filter (08:253) → per-device stats (08:261-266)
    → score + banding (08:270-284) → device→customer joins
    (08:120-126).

    Scale: one shuffle on deviceId for the window; the mapping and
    dim joins broadcast.
    """
    pos = telematics.filter(
        (F.col("variable") == "POSITION") & F.col("latitude").isNotNull()
    )
    w = Window.partitionBy("deviceId").orderBy("event_time")
    hops = pos.select(
        "deviceId",
        "event_time",
        "latitude",
        "longitude",
        F.lag("latitude").over(w).alias("prev_lat"),
        F.lag("longitude").over(w).alias("prev_lon"),
        F.lag("event_time").over(w).alias("prev_time"),
    )
    hops = hops.withColumn(
        "time_diff_sec",
        F.col("event_time").cast("long") - F.col("prev_time").cast("long"),
    ).filter(F.col("time_diff_sec") > 0)
    hops = hops.withColumn(
        "distance_km",
        haversine_km(
            F.col("prev_lat"), F.col("prev_lon"),
            F.col("latitude"), F.col("longitude"),
        ),
    ).withColumn("speed_kmh", speed_kmh(F.col("distance_km"), F.col("time_diff_sec")))
    hops = hops.filter(F.col("speed_kmh") < IMPOSSIBLE_KMH)

    stats = hops.groupBy("deviceId").agg(
        F.count(F.when(F.col("speed_kmh") > SPEEDING_KMH, 1)).alias(
            "speeding_incidents"
        ),
        F.avg("speed_kmh").alias("avg_speed"),
        F.max("speed_kmh").alias("max_speed"),
        F.count("*").alias("total_events"),
    )
    # Reference parity (08:270-284): the penalty formula applies ONLY
    # to devices with speeding incidents; clean drivers score a flat
    # 100 regardless of average speed.
    score = F.when(
        F.col("speeding_incidents") > 0,
        F.greatest(
            F.lit(100.0)
            - 5.0 * F.col("speeding_incidents")
            - F.col("avg_speed") / 20.0,
            F.lit(0.0),
        ),
    ).otherwise(F.lit(100.0))
    band = (
        F.when(F.col("driver_risk_score") >= 80, "SAFE")
        .when(F.col("driver_risk_score") >= 60, "MODERATE")
        .when(F.col("driver_risk_score") >= 40, "RISKY")
        .otherwise("VERY_RISKY")
    )
    scored = stats.withColumn("driver_risk_score", score).withColumn(
        "risk_category", band
    )
    return (
        # no hints: device_mapping scales with the fleet and
        # dim_customer with the customer base — AQE decides
        scored.join(device_mapping, ["deviceId"], "inner")
        .join(
            dim_customer.select("customer_key"),
            F.col("customer_id") == F.col("customer_key"),
            "inner",
        )
        .select(
            "customer_key",
            "deviceId",
            "speeding_incidents",
            "avg_speed",
            "max_speed",
            "total_events",
            "driver_risk_score",
            "risk_category",
        )
    )


# --------------------------------------------------------------------------
# Analytics (scripts 09/10) + DQ (script 06)
# --------------------------------------------------------------------------


def run_pipeline(
    spark: SparkSession,
    raw_dir: str,
    warehouse_dir: str,
    compat: bool = False,
) -> dict[str, DataFrame]:
    """The whole reference workflow as ONE driver program (the
    numbered scripts 01→10 as a dependency graph): ingest → clean →
    dims → facts → risk → analytics, with each layer written to
    ``warehouse_dir`` as Parquet. Returns the materialized outputs.

    Layers are written then re-read, so every downstream stage runs
    against the columnar on-disk layer (no giant lazy mega-plan, and
    multi-action fan-out doesn't recompute upstream cleaning — the
    reference recomputes per action, SURVEY §3 EP1.4).
    """
    from car_insurance_data_pipeline_spark_spark.sources.writers import write_parquet

    staged = ingest_raw(spark, raw_dir, f"{warehouse_dir}/staged")

    def materialize(name: str, df: DataFrame) -> DataFrame:
        write_parquet(df, f"{warehouse_dir}/{name}.parquet")
        return spark.read.parquet(f"{warehouse_dir}/{name}.parquet")

    contracts = materialize(
        "cleaned_contracts", clean_contracts(staged["contracts"], compat=compat)
    )
    vehicles = materialize("cleaned_vehicles", clean_vehicles(staged["vehicles"]))
    claims = materialize(
        "cleaned_claims", clean_claims(staged["claims"], compat=compat)
    )
    telematics = materialize(
        "cleaned_telematics", clean_telematics(staged["telematics_raw"])
    )

    dim_customer = materialize("dim_customer", build_dim_customer(contracts))
    dim_policy = materialize("dim_policy", build_dim_policy(contracts))
    dim_date = materialize("dim_date", build_dim_date(spark))

    fact_policy = materialize(
        "fact_policy_snapshot",
        build_fact_policy_snapshot(contracts, dim_customer, dim_policy),
    )
    fact_claims = materialize(
        "fact_claims", build_fact_claims(claims, contracts, dim_policy)
    )
    fact_risk = materialize(
        "fact_driver_risk",
        build_driver_risk(telematics, staged["device_mapping"], dim_customer),
    )

    trend = materialize(
        "analytics_monthly_trend", monthly_premium_trend(fact_policy, dim_date)
    )
    segments = materialize(
        "analytics_segments", segment_analysis(fact_policy, dim_customer)
    )
    return {
        "contracts": contracts,
        "vehicles": vehicles,
        "claims": claims,
        "telematics": telematics,
        "dim_customer": dim_customer,
        "dim_policy": dim_policy,
        "dim_date": dim_date,
        "fact_policy_snapshot": fact_policy,
        "fact_claims": fact_claims,
        "fact_driver_risk": fact_risk,
        "analytics_monthly_trend": trend,
        "analytics_segments": segments,
    }


def monthly_premium_trend(fact: DataFrame, dim_date: DataFrame) -> DataFrame:
    """09_analyze_fact_metrics.py:64-89: fact ⋈ dim_date on the int
    date key, monthly premium/policy totals, chronological order."""
    dd = dim_date.select(
        F.col("date_key_int").alias("load_date_key"),
        "year",
        "month",
        "month_name",
    )
    return (
        fact.join(F.broadcast(dd), ["load_date_key"], "inner")
        .groupBy("year", "month", "month_name")
        .agg(
            F.sum(F.col("total_premium").try_cast("decimal(27,6)"))
            .cast("double")
            .alias("total_premium"),
            F.sum("policy_count").alias("total_policies"),
        )
        .orderBy("year", "month")
    )


def segment_analysis(fact: DataFrame, dim_customer: DataFrame) -> DataFrame:
    """10_analyze_customer_segments.py:61-76: premium and volume by
    customer segment, ranked."""
    dc = dim_customer.select("customer_key", "segment")
    return (
        fact.join(dc, ["customer_key"], "inner")
        .groupBy("segment")
        .agg(
            F.sum(F.col("total_premium").try_cast("decimal(27,6)"))
            .cast("double")
            .alias("total_premium"),
            F.sum("policy_count").alias("total_policies"),
        )
        .orderBy(F.col("total_premium").desc())
    )
