"""Unit tests for the JX expression -> Column compiler.

One small DataFrame with every null/empty-string/typed edge; all cases are
compiled into a single select so the suite costs one Spark action. The
expectations encode JX semantics (missing = null-or-empty, 2-valued
predicates, null-skipping arithmetic) -- NOT SQL semantics.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from testlog_etl_spark.expressions import JXCompiler, jx_expression

SCHEMA = (
    "i long, a double, b double, s string, t string, e string, "
    "n double, n2 double, flag boolean, arr array<long>"
)
ROWS = [
    # i  a     b    s              t     e    n     n2    flag   arr
    (1, 1.0, 2.0, "hello world", "he", "", None, None, True, [1, 2]),
    (2, None, 5.0, None, None, "x", None, None, False, [2, 3]),
    (3, -3.5, 0.0, "worldly", "", "", 7.0, 7.0, None, None),
]

NOW = datetime(2024, 3, 15, 10, 30)

# (name, jx_expression, [expected row1, row2, row3])
CASES = [
    ("lit", {"literal": 42}, [42, 42, 42]),
    ("var", "b", [2.0, 5.0, 0.0]),
    ("and", {"and": ["flag", {"exists": "a"}]}, [True, False, False]),
    ("or", {"or": ["flag", {"missing": "a"}]}, [True, True, False]),
    ("not_missing", {"not": "n"}, [True, True, False]),
    # eq: missing == missing is TRUE; "" is missing
    ("eq_null_null", {"eq": ["n", "n2"]}, [True, True, True]),
    ("eq_empty_null", {"eq": ["e", "n"]}, [True, False, False]),
    ("eq_pair", {"eq": {"i": 1}}, [True, False, False]),
    ("ne", {"ne": ["a", "b"]}, [True, True, True]),
    ("gt_missing_false", {"gt": ["a", 0]}, [True, False, False]),
    ("lte", {"lte": ["a", "n"]}, [False, False, True]),
    ("in", {"in": ["i", {"literal": [1, 3]}]}, [True, False, True]),
    ("missing_empty", {"missing": "e"}, [True, False, True]),
    ("exists", {"exists": "s"}, [True, False, True]),
    ("prefix", {"prefix": {"s": "hel"}}, [True, False, False]),
    ("prefix_missing_pattern", {"prefix": ["s", "n"]}, [True, True, False]),
    ("suffix", {"suffix": {"s": "world"}}, [True, False, False]),
    ("regex_full", {"regex": {"s": "hello.*"}}, [True, False, False]),
    ("regex_not_partial", {"regex": {"s": "world"}}, [False, False, False]),
    (
        "when",
        {"when": {"gt": ["b", 3]}, "then": {"literal": "big"}, "else": {"literal": "small"}},
        ["small", "big", "small"],
    ),
    (
        "case",
        {
            "case": [
                {"when": {"eq": ["i", 1]}, "then": {"literal": "one"}},
                {"when": {"eq": ["i", 2]}, "then": {"literal": "two"}},
                {"literal": "many"},
            ]
        },
        ["one", "two", "many"],
    ),
    ("coalesce_empty_is_missing", {"coalesce": ["e", "t"]}, ["he", "x", None]),
    # arithmetic: skip missing; all-missing -> missing
    ("add_skip_null", {"add": ["a", "n"]}, [1.0, None, 3.5]),
    ("add_three", {"add": ["a", "b", "n"]}, [3.0, 5.0, 3.5]),
    ("mult_skip_null", {"mult": ["b", "n"]}, [2.0, 5.0, 0.0]),
    ("sub", {"sub": ["b", "a"]}, [1.0, None, 3.5]),
    ("div_by_zero_default", {"div": ["b", "n2"], "default": {"literal": -1.0}}, [-1.0, -1.0, 0.0]),
    ("div_null", {"div": ["b", "a"]}, [2.0, None, 0.0]),
    ("floor_interval", {"floor": ["a", {"literal": 2}]}, [0.0, None, -4.0]),
    ("floor_plain", {"floor": "a"}, [1.0, None, -4.0]),
    ("mod", {"mod": ["i", {"literal": 2}]}, [1.0, 0.0, 1.0]),
    ("max_scalar", {"max": ["a", "b", "n"]}, [2.0, 5.0, 7.0]),
    ("min_scalar", {"min": ["a", "n"]}, [1.0, None, -3.5]),
    ("abs", {"abs": "a"}, [1.0, None, 3.5]),
    ("exp", {"exp": ["b", {"literal": 2}]}, [4.0, 25.0, 0.0]),
    ("length", {"length": "s"}, [11, None, 7]),
    ("length_empty_is_missing", {"length": "e"}, [None, 1, None]),
    ("left_clamped", {"left": ["s", {"literal": 100}]}, ["hello world", None, "worldly"]),
    ("left", {"left": ["s", {"literal": 5}]}, ["hello", None, "world"]),
    ("right", {"right": ["s", {"literal": 5}]}, ["world", None, "rldly"]),
    ("not_left", {"not_left": ["s", {"literal": 6}]}, ["world", None, "y"]),
    ("not_right", {"not_right": ["s", {"literal": 6}]}, ["hello", None, "w"]),
    (
        "between",
        {"between": "s", "prefix": "he", "suffix": " world"},
        ["llo", None, None],
    ),
    ("find_hit", {"find": ["s", {"literal": "world"}]}, [6, None, 0]),
    ("find_miss_null", {"find": ["s", {"literal": "zzz"}]}, [None, None, None]),
    ("find_start", {"find": ["s", {"literal": "l"}], "start": 4}, [9, None, 5]),
    (
        "concat_skips_missing",
        {"concat": ["t", "e", {"literal": "z"}], "separator": "-"},
        ["he-z", "x-z", "z"],
    ),
    ("split", {"split": ["s", {"literal": " "}]}, [["hello", "world"], None, ["worldly"]]),
    ("number_lenient", {"number": {"literal": "42"}}, [42.0, 42.0, 42.0]),
    ("number_bad_null", {"number": "s"}, [None, None, None]),
    ("integer", {"integer": {"literal": "7.0"}}, [7, 7, 7]),
    ("string", {"string": "i"}, ["1", "2", "3"]),
    ("boolean_t", {"boolean": {"literal": "T"}}, [True, True, True]),
    ("tuple_get", {"get": [{"tuple": [{"literal": 10}, "i"]}, {"literal": 1}]}, [1, 2, 3]),
    ("get_arr", {"get": ["arr", {"literal": 0}]}, [1, 2, None]),
    ("union", {"union": ["arr", {"tuple": [{"literal": 9}]}]}, [[1, 2, 9], [2, 3, 9], None]),
    ("count_nonmissing", {"count": ["a", "s", "e"]}, [2, 1, 2]),
    ("script", {"script": "i + 1"}, [2, 3, 4]),
]


def test_jx_expressions(spark):
    df = spark.createDataFrame(ROWS, schema=SCHEMA)
    compiler = JXCompiler(now=NOW)
    sel = [jx_expression(expr, compiler).alias(f"c{k}") for k, (_, expr, _) in enumerate(CASES)]
    out = df.orderBy("i").select(*sel).collect()
    failures = []
    for k, (name, _, expected) in enumerate(CASES):
        got = [row[f"c{k}"] for row in out]
        if got != expected:
            failures.append(f"{name}: got {got!r}, want {expected!r}")
    assert not failures, "\n".join(failures)


def test_date_literals(spark):
    c = JXCompiler(now=NOW)
    assert c._parse_date_literal("today") == datetime(2024, 3, 15)
    assert c._parse_date_literal("today-week") == datetime(2024, 3, 8)
    assert c._parse_date_literal("now-2hour") == datetime(2024, 3, 15, 8, 30)
    assert c._parse_date_literal("today-month") == datetime(2024, 2, 15)
    assert c._parse_date_literal("today+2month") == datetime(2024, 5, 15)
    # calendar month clamp: Jan 31 - 1 month -> Feb 29 would clamp
    c2 = JXCompiler(now=datetime(2024, 3, 31))
    assert c2._parse_date_literal("today-month") == datetime(2024, 2, 29)
    assert c._parse_date_literal("tomorrow") == datetime(2024, 3, 16)
    assert c._parse_date_literal("not a date") is None


def test_unknown_op_raises(spark):
    with pytest.raises(ValueError, match="unknown JX op"):
        jx_expression({"frobnicate": ["a"]})


def test_flatlist_multivalue_semantics(spark):
    """SURVEY SS1.1 hard spot: scalar<->list interchangeability. Arrays
    stay arrays at rest; the operators treat a multivalued field as equal
    to a scalar when ANY element matches (ES term semantics), `in` as
    any-overlap, and missing as null-or-empty-array."""
    df = spark.createDataFrame(ROWS, schema=SCHEMA)
    c = JXCompiler(now=NOW, dtypes=dict(df.dtypes))
    cases = [
        ("eq_any_element", {"eq": ["arr", {"literal": 2}]}, [True, True, False]),
        ("eq_no_match", {"eq": ["arr", {"literal": 9}]}, [False, False, False]),
        ("in_overlap", {"in": ["arr", {"literal": [3, 9]}]}, [False, True, False]),
        ("missing_arr", {"missing": "arr"}, [False, False, True]),
        ("exists_arr", {"exists": "arr"}, [True, True, False]),
    ]
    sel = [jx_expression(e, c).alias(f"c{k}") for k, (_, e, _) in enumerate(cases)]
    out = df.orderBy("i").select(*sel).collect()
    for k, (name, _, expected) in enumerate(cases):
        got = [row[f"c{k}"] for row in out]
        assert got == expected, f"{name}: got {got!r}, want {expected!r}"

    # empty array is missing; missing array == missing scalar is TRUE
    df2 = spark.createDataFrame([([], None)], "arr array<long>, n double")
    c2 = JXCompiler(now=NOW, dtypes=dict(df2.dtypes))
    [row] = df2.select(
        jx_expression({"missing": "arr"}, c2).alias("m"),
        jx_expression({"eq": ["arr", "n"]}, c2).alias("eq_mm"),
    ).collect()
    assert row["m"] is True
    assert row["eq_mm"] is True


def test_typed_variant_field(spark):
    """SS1.2 typed-encoder analog: per-type variants are gated on the
    value's ACTUAL type (try_variant_get alone would coerce 5 -> "5")."""
    from testlog_etl_spark.operators.typedjson import parse_variant, typed_field

    df = spark.createDataFrame(
        [('{"x": 5}',), ('{"x": "five"}',), ('{"x": true}',), ('{"x": 5.5}',), ("{}",), ("not json",)],
        ["j"],
    )
    out = df.select(typed_field(parse_variant(F.col("j")), "$.x").alias("x")).collect()
    got = [(r["x"]["b"], r["x"]["n"], r["x"]["s"], r["x"]["e"]) for r in out]
    assert got == [
        (None, 5.0, None, True),
        (None, None, "five", True),
        (True, None, None, True),
        (None, 5.5, None, True),
        (None, None, None, False),
        (None, None, None, False),
    ]
