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
    SimpleDataSourceStreamReader,
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


class SensorStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch pull reader over the same kind of closed-form
    feed (law: device = r mod 53, temp_d = (3r² + 7) mod 5000 −
    2500): each `read` advances the offset by `chunk` rows until the
    `n_rows` cap, then reports no new data — exactly how a queue/
    HTTP-pager connector paginates. `readBetweenOffsets` replays a
    committed span for recovery, so a restarted query re-reads the
    identical rows (the determinism the exactly-once contract needs
    from a source)."""

    def __init__(self, options):
        self.n = int(options.get("n_rows", "2000"))
        self.chunk = max(1, int(options.get("chunk", "500")))

    @staticmethod
    def _rows(lo: int, hi: int):
        # list iterator, not a generator: Spark's prefetch cache
        # copy.copy()s the iterator when planning partitions, and
        # generators aren't copyable
        return iter(
            [
                (r, r % 53, (3 * r * r + 7) % 5000 - 2500)
                for r in range(lo, hi)
            ]
        )

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = start["pos"]
        end = min(pos + self.chunk, self.n)
        return self._rows(pos, end), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["pos"], end["pos"])

    def commit(self, end: dict) -> None:
        pass


class SensorStreamDataSource(DataSource):
    """format("sensor_stream") — the streaming face of the custom
    connector (registered alongside sensor_synth)."""

    @classmethod
    def name(cls) -> str:
        return "sensor_stream"

    def schema(self) -> str:
        return "reading_id long, device long, temp_d long"

    def simpleStreamReader(self, schema):
        return SensorStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(SensorStreamDataSource)
