"""Streaming sinks beyond the built-ins: an idempotent foreachBatch
JDBC upsert — the deployment shape for landing a stream into a
relational warehouse (the reference's warehouse is PostgreSQL over
JDBC, config.py:40-49; its loads are batch-only, so this is the
parity-plus streaming counterpart of sources/writers.py:write_jdbc).

Exactly-once contract: Structured Streaming replays a micro-batch
(same batch_id) after a failure between sink write and checkpoint
commit. The sink therefore makes (batch_id -> effect) idempotent:

1. Each batch stages to ``<table>_stage`` via the plain Spark JDBC
   writer (overwrite — a replay simply restages the same rows).
2. One driver-side JDBC transaction then: checks the batch ledger
   (``<table>_batches``) and SKIPS committed batch_ids; deletes
   target rows whose keys appear in the stage (set-based
   DELETE ... EXISTS, no per-key loop); inserts the stage;
   records the batch_id. Data + ledger commit atomically, so a
   crash before commit re-runs cleanly and a crash after commit
   turns the replay into a no-op.

Scale: the stage write is the distributed part (partitioned JDBC
writer). The merge transaction is set-based SQL executed BY THE
DATABASE — the driver ships two statements, not rows. On a
MERGE-capable warehouse, swap the delete+insert pair for one MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from car_insurance_data_pipeline_spark_spark.sources.writers import write_jdbc


def _connect(spark, url: str, properties: dict[str, str] | None):
    props = spark._jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    return spark._jvm.java.sql.DriverManager.getConnection(url, props)


def _table_exists(conn, table: str) -> bool:
    rs = conn.getMetaData().getTables(None, None, table.upper(), None)
    try:
        return rs.next()
    finally:
        rs.close()


def upsert_batch_jdbc(
    batch_df: DataFrame,
    batch_id: int,
    url: str,
    table: str,
    key_cols: list[str],
    properties: dict[str, str] | None = None,
) -> bool:
    """Idempotently upsert one micro-batch into ``table``.

    Returns True if the batch was applied, False if the ledger
    showed it already committed (replay after a sink/checkpoint
    race). Usable directly as a foreachBatch body via
    ``jdbc_upsert_writer`` or standalone for batch backfills.
    """
    spark = batch_df.sparkSession
    stage = f"{table}_stage"
    ledger = f"{table}_batches"

    # last-wins within the batch: one row per key
    deduped = batch_df.dropDuplicates(key_cols)

    # 1. distributed stage write (plain JDBC writer; replay restages)
    write_jdbc(deduped, url, stage, mode="overwrite", properties=properties)

    # Spark's JDBC writer quotes column identifiers (they land
    # case-exact, not folded to the dialect default) — quote them in
    # the merge SQL too so the names resolve. String keys compare
    # through a VARCHAR cast: some dialects (Derby) store StringType
    # as CLOB, which is not directly comparable.
    cols = deduped.columns
    str_keys = {
        f.name
        for f in deduped.schema.fields
        if f.dataType.simpleString() == "string"
    }

    def _key(alias: str, k: str) -> str:
        ident = f'{alias}."{k}"'
        return (
            f"CAST({ident} AS VARCHAR(512))" if k in str_keys else ident
        )

    key_pred = " AND ".join(
        f"{_key('t', k)} = {_key('s', k)}" for k in key_cols
    )
    col_list = ", ".join(f'"{c}"' for c in cols)

    # 2. one driver-side transaction: ledger check + set-based merge
    conn = _connect(spark, url, properties)
    try:
        conn.setAutoCommit(False)
        st = conn.createStatement()
        try:
            if not _table_exists(conn, ledger):
                st.executeUpdate(
                    f"CREATE TABLE {ledger} (batch_id BIGINT PRIMARY KEY)"
                )
                conn.commit()
            rs = st.executeQuery(
                f"SELECT 1 FROM {ledger} WHERE batch_id = {int(batch_id)}"
            )
            committed = rs.next()
            rs.close()
            if committed:
                conn.rollback()
                return False
            if not _table_exists(conn, table):
                # clone the stage's layout for the first batch
                st.executeUpdate(
                    f"CREATE TABLE {table} AS SELECT * FROM {stage} WITH NO DATA"
                )
            st.executeUpdate(
                f"DELETE FROM {table} t WHERE EXISTS "
                f"(SELECT 1 FROM {stage} s WHERE {key_pred})"
            )
            st.executeUpdate(
                f"INSERT INTO {table} ({col_list}) "
                f"SELECT {col_list} FROM {stage}"
            )
            st.executeUpdate(
                f"INSERT INTO {ledger} (batch_id) VALUES ({int(batch_id)})"
            )
            conn.commit()
            return True
        finally:
            st.close()
    except Exception:
        conn.rollback()
        raise
    finally:
        conn.close()


def jdbc_upsert_writer(
    url: str,
    table: str,
    key_cols: list[str],
    properties: dict[str, str] | None = None,
):
    """foreachBatch adapter:
    ``stream.writeStream.foreachBatch(jdbc_upsert_writer(...))``."""

    def body(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch_jdbc(
            batch_df, batch_id, url, table, key_cols, properties
        )

    return body
