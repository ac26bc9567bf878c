"""T6: code-coverage artifacts -> per-file coverage documents.

Reference: activedata_etl/transforms/gcov_to_es.py (and grcov/jsvm
variants) parse lcov-ish text artifacts into one document per source
file with covered/uncovered line arrays and summary ratios.

Spark realization: the lcov record format is line-oriented
(`SF:<path>` opens a file record, `DA:<line>,<hits>` marks line data,
`end_of_record` closes), so the parse is: filter to the marker lines,
tag each with its enclosing SF record via a running window count -- one
pass, no Python. At 100 TB of artifacts the window partitions by
artifact key, which is the natural parallel unit (records never span
artifacts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_lcov(lines: DataFrame, line_col: str = "value", log_col: str = "log_key") -> DataFrame:
    """lcov text lines (with a stable `line_no` order column) -> one row
    per source file: covered/uncovered line lists + ratio."""
    s = F.col(line_col)
    w = Window.partitionBy(log_col).orderBy("line_no")
    tagged = (
        lines.withColumn("_sf", F.when(s.startswith("SF:"), F.substring(s, 4, 10_000)))
        # running count of SF markers = record index; every DA line joins
        # its enclosing record without a self-join
        .withColumn("_rec", F.count("_sf").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("_file", F.last("_sf", ignorenulls=True).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    da = tagged.filter(s.startswith("DA:")).select(
        F.col(log_col),
        F.col("_file").alias("source_file"),
        F.split(F.substring(s, 4, 10_000), ",").alias("_parts"),
    )
    da = da.select(
        log_col,
        "source_file",
        F.element_at("_parts", 1).cast("int").alias("line"),
        F.element_at("_parts", 2).cast("long").alias("hits"),
    )
    return (
        da.groupBy(log_col, "source_file")
        .agg(
            F.sort_array(F.collect_list(F.when(F.col("hits") > 0, F.col("line")))).alias("covered_lines"),
            F.sort_array(F.collect_list(F.when(F.col("hits") == 0, F.col("line")))).alias("uncovered_lines"),
            F.count(F.lit(1)).alias("total_lines"),
            F.sum((F.col("hits") > 0).cast("long")).alias("covered_count"),
        )
        .withColumn("coverage_ratio", F.round(F.col("covered_count") / F.col("total_lines"), 6))
    )
