"""Spark 4 Python Data Source: a partitioned, filter-pushing synthetic
source (SURVEY SS2.1 surface coverage -- the API a user writes to wire a
system Spark has no built-in connector for, e.g. an internal queue or a
bespoke block format, without touching the JVM).

Two scale-relevant behaviors are demonstrated for real, not mocked:

- **partition planning**: ``partitions()`` splits the key range into
  ``parts`` independent ``InputPartition``s, so the scan parallelizes
  across executors exactly like a file source's splits (one Python
  worker per partition, Arrow-batched back to the JVM);
- **source-level filter pushdown**: ``pushFilters`` accepts
  ``EqualTo("bucket", k)`` and drops the matching rows AT THE SOURCE
  (generation skips them), returning every other predicate to Spark --
  the contract that lets a remote source ship 1/1000th of itself
  instead of everything (the Python analog of parquet PushedFilters).

Rows are a deterministic pure function of the row id (Knuth
multiplicative hash mod a prime, integer math), so a DuckDB oracle can
replay the whole source from ``range(n)`` exactly.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, EqualTo, InputPartition

# value = (id * KNUTH) % PRIME: spreads ids over [0, PRIME) deterministically;
# id * KNUTH stays far under 2^63 for every n this source is asked for
KNUTH = 2654435761
PRIME = 1000003
N_BUCKETS = 7


def row_value(i: int) -> int:
    return (i * KNUTH) % PRIME


class RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", "100000"))
        self.parts = int(options.get("parts", "8"))
        self.bucket_eq: int | None = None

    def pushFilters(self, filters: Sequence) -> Iterator:
        """Accept at most one EqualTo('bucket', k); everything else is
        returned to Spark to evaluate post-scan (the API contract:
        yielded filters are UNSUPPORTED)."""
        for f in filters:
            if (
                self.bucket_eq is None
                and isinstance(f, EqualTo)
                and f.attribute == ("bucket",)
                and isinstance(f.value, int)
            ):
                self.bucket_eq = f.value
            else:
                yield f

    def partitions(self) -> list[RangePartition]:
        chunk = -(-self.n // self.parts)  # ceil division
        return [
            RangePartition(lo, min(lo + chunk, self.n))
            for lo in range(0, self.n, chunk)
        ]

    def read(self, partition: RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            bucket = i % N_BUCKETS
            if self.bucket_eq is not None and bucket != self.bucket_eq:
                continue  # pushed filter: the row never leaves the source
            yield (i, bucket, row_value(i))


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, bucket int, value bigint"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-registering replaces the prior one).
    Python-source filter pushdown ships disabled by default in 4.1; a
    reader that implements pushFilters FAILS under the default conf, so
    registration enables it (runtime SQL conf, session-scoped)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
