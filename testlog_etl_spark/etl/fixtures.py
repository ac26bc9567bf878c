"""Deterministic synthetic CI artifacts for the T2/T3/T5 transforms.

The driver's parquet tables carry no mozlog/buildbot/perfherder content,
so these generators produce byte-stable fixtures (seeded arithmetic, no
randomness) that the golden-file tests (tests/test_etl.py) and the
fixture-driven `queries()` entries share. Mirrors the reference's
tests/resources/ sample-artifact strategy (SURVEY SS5).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

MOZLOG_SCHEMA = StructType(
    [
        StructField("suite_key", StringType()),
        StructField("action", StringType()),
        StructField("time", DoubleType()),
        StructField("test", StringType()),
        StructField("subtest", StringType()),
        StructField("status", StringType()),
        StructField("expected", StringType()),
    ]
)


def mozlog_lines(spark: SparkSession, n_suites: int = 3, n_tests: int = 20) -> DataFrame:
    """test_start / 3x test_status / test_end per test; every 7th test has
    one unexpected subtest FAIL, every 5th an unexpected end status."""
    rows = []
    for s in range(n_suites):
        key = f"suite{s}"
        t0 = 1_700_000_000.0 + s * 10_000
        for i in range(n_tests):
            test = f"dom/test_{i:03d}.html"
            start = t0 + i * 10.0
            rows.append((key, "test_start", start, test, None, None, None))
            for j in range(3):
                fail = j == 1 and i % 7 == 0
                rows.append(
                    (
                        key,
                        "test_status",
                        start + 1 + j,
                        test,
                        f"assert_{j}",
                        "FAIL" if fail else "PASS",
                        "PASS",
                    )
                )
            bad_end = i % 5 == 0 and i > 0
            rows.append(
                (key, "test_end", start + 8.0, test, None, "ERROR" if bad_end else "OK", "OK")
            )
    return spark.createDataFrame(rows, MOZLOG_SCHEMA)


def text_log_lines(spark: SparkSession, n_logs: int = 4, n_steps: int = 6) -> DataFrame:
    """buildbot-style Started/Finished marker lines around filler noise."""
    rows = []
    for g in range(n_logs):
        key = f"log{g}"
        minute = 0
        for s in range(n_steps):
            name = f"step_{s} build" if s % 2 == 0 else f"step_{s} test"
            code = 1 if (g == 1 and s == 3) else 0
            elapsed = 30 + 7 * s
            start = f"2024-02-0{g + 1} 00:{minute:02d}:00.000"
            minute += 1 + s % 3
            end = f"2024-02-0{g + 1} 00:{minute:02d}:00.000"
            rows.append((key, f"========= Started {name} (results: 0, elapsed: 0 secs) (at {start}) ========="))
            rows.append((key, f"some harness output line {s} for {key}"))
            rows.append(
                (key, f"========= Finished {name} (results: {code}, elapsed: {elapsed} secs) (at {end}) =========")
            )
    return spark.createDataFrame(rows, ["log_key", "value"])


def lcov_lines(spark: SparkSession, n_logs: int = 2, n_files: int = 3, n_lines: int = 10) -> DataFrame:
    """lcov-ish coverage artifacts: SF:/DA:/end_of_record records with a
    deterministic hit pattern (line covered iff (line + file) % 3 != 0)."""
    rows = []
    for g in range(n_logs):
        key = f"cov{g}"
        ln = 0
        for f_i in range(n_files):
            rows.append((key, ln, f"SF:src/module_{f_i}.py")); ln += 1
            for line in range(1, n_lines + 1):
                hits = 0 if (line + f_i) % 3 == 0 else line + g
                rows.append((key, ln, f"DA:{line},{hits}")); ln += 1
            rows.append((key, ln, "end_of_record")); ln += 1
    return spark.createDataFrame(rows, ["log_key", "line_no", "value"])


def perfherder_lines(spark: SparkSession, n_logs: int = 3) -> DataFrame:
    """logs with one PERFHERDER_DATA json blob each, plus noise lines."""
    rows = []
    for g in range(n_logs):
        key = f"perf{g}"
        blob = {
            "framework": {"name": "talos"},
            "suites": [
                {
                    "name": f"suite_{g}",
                    "value": 100.0 + g,
                    "subtests": [
                        {
                            "name": f"sub_{k}",
                            "value": 10.0 * (k + 1) + g,
                            "replicates": [10.0 * (k + 1) + g + d for d in (-1.0, 0.0, 1.0, 2.0)],
                        }
                        for k in range(3)
                    ],
                }
            ],
        }
        rows.append((key, "INFO - starting"))
        rows.append((key, "PERFHERDER_DATA: " + json.dumps(blob)))
        rows.append((key, "INFO - done"))
    return spark.createDataFrame(rows, ["log_key", "value"])
