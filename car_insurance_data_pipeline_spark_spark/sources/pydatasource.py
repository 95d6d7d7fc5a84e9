"""Custom connector on the Spark 4 Python DataSource API.

The reference's source surface is CSV/Parquet/JDBC (SURVEY §2.1);
this module adds the engine's CUSTOM-connector capability on the
official extension point (`pyspark.sql.datasource`) rather than an
ad-hoc mapInPandas generator: a registered format with a declared
schema, option handling, and PARTITIONED parallel reads — the same
three things any real connector (REST pager, message queue, vendor
SDK) must implement. The payload here is a deterministic synthetic
"sensor" feed whose generation law is closed-form, which is what
lets a SQL oracle verify the full read path (partition planning →
per-partition iterators → Arrow conversion) value-for-value.

Scale: `partitions()` is the parallelism contract — each
InputPartition becomes one Spark task, so a production connector
splits by shard/page/offset range exactly as SensorReader splits by
row range; no driver-side materialization anywhere.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SensorReader(DataSourceReader):
    """Partitioned reader over the synthetic sensor law:
    reading r → (reading_id=r, device=r mod 97,
    temp_d=(r² mod 4000) − 1000)."""

    def __init__(self, options):
        self.n = int(options.get("n_rows", "1000"))
        self.parts = max(1, int(options.get("n_parts", "8")))

    def partitions(self):
        step = (self.n + self.parts - 1) // self.parts
        return [
            _RangePartition(i, min(i + step, self.n))
            for i in range(0, self.n, step)
        ]

    def read(self, partition):
        for r in range(partition.start, partition.end):
            yield (r, r % 97, (r * r) % 4000 - 1000)


class SensorDataSource(DataSource):
    """format("sensor_synth") — registered via
    `spark.dataSource.register(SensorDataSource)` (idempotent)."""

    @classmethod
    def name(cls) -> str:
        return "sensor_synth"

    def schema(self) -> str:
        return "reading_id long, device long, temp_d long"

    def reader(self, schema):
        return SensorReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SensorDataSource)
