"""Typed-JSON multi-type fields (SURVEY SS1.2): the reference stores each
leaf with a type sigil (`~n~` number / `~s~` string / `~b~` boolean /
`~e~` exists -- vendor/mo_json/typed_encoder.py::typed_encode) because one
field name may hold different types across documents.

Spark realization: the dynamic-JSON column parses once to a Spark 4
VARIANT; a "typed field" is a struct of per-type variants gated on
`schema_of_variant` -- gating matters because `try_variant_get` COERCES
(5 -> "5", true -> 1.0), while the typed encoder records the type the
value actually had.

Scale: parse_json runs once per row at scan time (codegen'd, no Python);
extraction per field is O(1) on the variant binary -- the same
read-amplification profile as the reference's doc-values per typed leaf.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NUMERIC_RE = "^(TINYINT|SMALLINT|INT|BIGINT|FLOAT|DOUBLE|DECIMAL)"


def parse_variant(json_col: Column | str) -> Column:
    """Lenient parse (malformed JSON -> NULL variant, the reference's
    scrub-and-continue)."""
    return F.try_parse_json(json_col)


def typed_field(variant_col: Column, path: str) -> Column:
    """One dynamic leaf -> struct(b, n, s, e): the per-type variants a
    multi-typed field fans into (boolean / number / string / exists)."""
    sub = F.try_variant_get(variant_col, path, "variant")
    t = F.schema_of_variant(sub)
    return F.struct(
        F.when(t == "BOOLEAN", F.try_variant_get(sub, "$", "boolean")).alias("b"),
        F.when(t.rlike(_NUMERIC_RE), F.try_variant_get(sub, "$", "double")).alias("n"),
        F.when(t == "STRING", F.try_variant_get(sub, "$", "string")).alias("s"),
        sub.isNotNull().alias("e"),
    )
