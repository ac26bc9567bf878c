"""Driver-contract smoke: entry() runs on sf0.001 and yields rows with a
stable schema; every queries() key with an oracle has matching names."""

from __future__ import annotations


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_registry_consistency():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 1


def test_events_read_without_session_level_nanos_conf(spark, sf_dir):
    """The driver harness builds its OWN SparkSession, without
    spark.sql.legacy.parquet.nanosAsLong. load_table must still read
    events.parquet (TIMESTAMP NANOS) by setting the conf defensively at
    read time. Simulate by unsetting the conf on the shared session first
    (runtime conf, so unset/set is safe and scoped to this test)."""
    from pyspark.sql.types import TimestampType

    from testlog_etl_spark.tables import load_table

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = load_table(spark, sf_dir, "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType)
        assert df.limit(5).count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
