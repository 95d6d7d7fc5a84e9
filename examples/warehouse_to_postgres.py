"""The reference's whole product, end to end, against a REAL
PostgreSQL: raw insurance CSVs → staged parquet → cleaned layers →
Kimball star schema (run_pipeline) → dims + fact loaded into a live
pg 15 server under enforced PRIMARY/FOREIGN KEY constraints → a
warehouse-side analytic rollup cross-checked against Spark.

This is scripts 01→09 of the reference
(01_ingest_csv_to_parquet.py … 05_load_fact_tables.py,
09_analyze_fact_metrics.py) as one driver program with a real
warehouse at the end. The pg hop goes through COPY (no pgjdbc jar
ships in this container; Spark's JDBC code path is live-verified
against Derby and DuckDB in tests/).

Run directly (spins an embedded pg cluster on a unix socket,
requires the server binaries + the postgres OS user; skips
gracefully otherwise):

    python examples/warehouse_to_postgres.py
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

PG_CTL = "/usr/local/bin/pg_ctl"
INITDB = "/usr/local/bin/initdb"

DDL = """
DROP TABLE IF EXISTS fact_policy_snapshot;
DROP TABLE IF EXISTS dim_customer;
DROP TABLE IF EXISTS dim_policy;
CREATE TABLE dim_customer (
  customer_key TEXT PRIMARY KEY, first_name TEXT, last_name TEXT,
  age DOUBLE PRECISION, gender TEXT, city_postal TEXT,
  segment TEXT, load_date DATE);
CREATE TABLE dim_policy (
  policy_key BIGINT PRIMARY KEY, contract_id TEXT, product_type TEXT,
  risk_zone TEXT, sales_channel TEXT, contract_status TEXT,
  load_date DATE);
CREATE TABLE fact_policy_snapshot (
  customer_key TEXT NOT NULL REFERENCES dim_customer,
  policy_key BIGINT NOT NULL REFERENCES dim_policy,
  load_date_key INT NOT NULL,
  policy_count INT NOT NULL,
  total_premium DOUBLE PRECISION);
"""


def _pg(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "postgres", "-c", cmd], capture_output=True, text=True,
        cwd="/tmp",
    )


def _psql(sock: str, sql: str) -> str:
    with tempfile.NamedTemporaryFile(
        "w", suffix=".sql", dir="/tmp", delete=False
    ) as f:
        f.write(sql)
        path = f.name
    os.chmod(path, 0o644)
    try:
        r = _pg(f"psql -h {sock} -d postgres -v ON_ERROR_STOP=1 -At -f {path}")
        if r.returncode != 0:
            raise RuntimeError(f"psql failed: {r.stderr}")
        return r.stdout
    finally:
        os.unlink(path)


def load_star(spark, raw_dir: str, work_dir: str, pg_sock: str) -> dict:
    """run_pipeline → COPY dims+fact into pg under constraints →
    return {table: rowcount} plus the cross-checked rollup size."""
    from pyspark.sql import functions as F

    from car_insurance_data_pipeline_spark_spark.plans.insurance import run_pipeline

    out = run_pipeline(spark, raw_dir, f"{work_dir}/wh")
    _psql(pg_sock, DDL)

    io = tempfile.mkdtemp(prefix="pg_star_io_", dir="/tmp")
    os.chmod(io, 0o777)
    counts: dict[str, int] = {}
    try:
        for tname, df in [
            ("dim_customer", out["dim_customer"]),
            ("dim_policy", out["dim_policy"]),
            ("fact_policy_snapshot", out["fact_policy_snapshot"]),
        ]:
            sub = f"{io}/{tname}"
            (
                df.coalesce(1)
                .write.mode("overwrite")
                .option("nullValue", "\\N")
                .option("escape", '"')
                .csv(sub, header=False)
            )
            part = glob.glob(f"{sub}/part-*.csv")[0]
            os.chmod(part, 0o644)
            os.chmod(sub, 0o755)
            _psql(
                pg_sock,
                f"\\copy {tname} FROM '{part}' WITH (FORMAT csv, NULL '\\N')",
            )
            counts[tname] = int(
                _psql(pg_sock, f"SELECT COUNT(*) FROM {tname};").strip()
            )

        pg_rows = _psql(
            pg_sock,
            """
            SELECT COALESCE(d.segment, '<NULL>'), COUNT(*),
                   CAST(SUM(CAST(f.total_premium AS NUMERIC(27,6)))
                        AS DOUBLE PRECISION)
            FROM fact_policy_snapshot f
            JOIN dim_customer d USING (customer_key)
            GROUP BY 1 ORDER BY 1;
            """,
        ).strip().splitlines()
        sp_rows = (
            out["fact_policy_snapshot"]
            .join(
                out["dim_customer"].select("customer_key", "segment"),
                "customer_key",
            )
            .groupBy(
                F.coalesce(F.col("segment"), F.lit("<NULL>")).alias("segment")
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("total_premium").cast("decimal(27,6)"))
                .cast("double")
                .alias("s"),
            )
            .collect()
        )
        want = sorted((str(r.segment), r.n, float(r.s)) for r in sp_rows)
        got = sorted(
            (p.split("|")[0], int(p.split("|")[1]), float(p.split("|")[2]))
            for p in pg_rows
        )
        if got != want:
            raise AssertionError(f"rollup mismatch: {got} != {want}")
        counts["rollup_groups"] = len(got)
        return counts
    finally:
        shutil.rmtree(io, ignore_errors=True)


def main() -> None:
    if not (os.path.exists(PG_CTL) and os.path.exists(INITDB)):
        print("SKIP: PostgreSQL server binaries not installed")
        return
    if _pg("true").returncode != 0:
        print("SKIP: no postgres OS user")
        return

    from car_insurance_data_pipeline_spark_spark.session import get_session

    import tests.fixtures as fx

    base = tempfile.mkdtemp(prefix="pg_demo_", dir="/tmp")
    os.chmod(base, 0o755)
    shutil.chown(base, "postgres", "postgres")
    data = f"{base}/data"
    work = tempfile.mkdtemp(prefix="pg_demo_work_")
    spark = None
    try:
        for cmd in (
            f"{INITDB} -D {data} -A trust",
            f"{PG_CTL} -D {data} -o '-k {base} -c listen_addresses=' "
            f"-l {base}/pg.log -w start",
        ):
            r = _pg(cmd)
            if r.returncode != 0:
                print(f"SKIP: {r.stderr[-200:]}")
                return

        raw = f"{work}/raw"
        os.makedirs(raw)
        fx.contracts_csv(f"{raw}/contracts.csv")
        fx.vehicles_csv(f"{raw}/vehicles.csv")
        fx.claims_csv(f"{raw}/claims.csv")
        fx.telematics_csv(f"{raw}/telematics.csv")
        fx.device_mapping_csv(f"{raw}/device_mapping.csv")

        spark = get_session(app_name="warehouse-to-postgres")
        counts = load_star(spark, raw, work, base)
        print("star schema in live PostgreSQL:", counts)
    finally:
        if spark is not None:
            spark.stop()
        _pg(f"{PG_CTL} -D {data} -m immediate stop")
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
