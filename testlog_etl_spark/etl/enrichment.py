"""J1/J4/S4: enrichment against a cached dimension with batched fetch
for cache misses.

Reference shapes: hg.mozilla.org revision metadata (mo_hg, ES-backed
cache) and TUID annotation (tuid_client, batch RPC) -- every doc needs
an attribute from an external service; a cache table answers most keys,
misses are fetched in batches, results rejoin the stream.

Spark realization:
- cache hits: LEFT **broadcast** join (the cache is small relative to
  the fact stream -- the fact table never shuffles);
- misses: distinct keys only (never row-per-fact) through an
  Arrow-batched `mapInPandas` fetcher -- the real HTTP call is stubbed
  (no network here), the batching/plumbing is real;
- results: union of hit- and fetched-paths. At scale, fetched results
  would also be appended to the cache table (the reference does exactly
  this with its ES cache).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

ENRICH_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("meta", StringType()),
    ]
)


def http_fetch(keys: list[int]) -> list[str]:
    """REAL FETCH STUB: the reference issues batched HTTPS requests
    (hg.mozilla.org / TUID service); no network in this environment."""
    raise NotImplementedError("network fetch not available in this environment")


def fake_fetch(keys: list[int]) -> list[str]:
    """Deterministic stand-in with the same signature."""
    return [f"fetched_{k}" for k in keys]


def fetch_missing(miss_keys: DataFrame, fetch: Callable[[list[int]], list[str]]) -> DataFrame:
    """Batch-fetch metadata for distinct missing keys via mapInPandas
    (one fetch call per Arrow batch, the reference's batched-RPC shape)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            keys = [int(k) for k in pdf["key"]]
            yield pd.DataFrame({"key": keys, "meta": fetch(keys)})

    return miss_keys.mapInPandas(run, ENRICH_SCHEMA)


def enrich_with_cache(
    df: DataFrame,
    cache: DataFrame,
    key_col: str,
    fetch: Callable[[list[int]], list[str]] = http_fetch,
) -> DataFrame:
    """df + `meta` column: from the broadcast cache when present, else
    batch-fetched. cache schema: (key, meta)."""
    hits = df.join(
        F.broadcast(cache.withColumnRenamed("key", key_col)), key_col, "left"
    )
    misses = hits.filter(F.col("meta").isNull()).drop("meta")
    resolved = hits.filter(F.col("meta").isNotNull())
    if misses.isEmpty():
        return resolved
    fetched = fetch_missing(
        misses.select(F.col(key_col).alias("key")).distinct(), fetch
    ).withColumnRenamed("key", key_col)
    filled = misses.join(F.broadcast(fetched), key_col, "left")
    return resolved.unionByName(filled)
