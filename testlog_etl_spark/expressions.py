"""JX expression -> pyspark Column compiler (SURVEY SS2.2, E1-E31).

The reference parses JSON query expressions into an `Expression` AST
(`vendor/jx_base/expressions.py::jx_expression`) and lowers it per
backend (Python lambdas / ES Painless / SQLite SQL). Here there is one
lowering: to `pyspark.sql.Column`, so Catalyst's constant folding, null
propagation, and predicate pushdown replace the reference's
`partial_eval()` (SURVEY SS4 R1-R3).

JX null semantics (deliberately different from SQL 3-valued logic; see
SURVEY SS2.2 "null semantics to preserve"):

- "missing" means SQL NULL **or empty string**;
- an expression used as a predicate is 2-valued: missing -> False;
- ``eq`` treats two missings as equal (SQL ``IS NOT DISTINCT FROM`` after
  empty-string normalization);
- multi-arg arithmetic (``add``/``mult``/scalar ``max``...) *skips*
  missing operands; only all-missing yields missing;
- string ops are clamped/total: ``left`` past the end truncates, ``find``
  misses as NULL (not -1), ``between`` with absent markers is NULL.

Every op here is built from JVM-side `pyspark.sql.functions` -- no Python
UDFs -- so compiled predicates stay inside whole-stage codegen and push
down to parquet scans. This is the property that makes the compiler
scale-correct: a JX ``where`` becomes a `PushedFilters` entry, exactly as
the reference pushes its ``where`` into the ES query DSL.

Expression JSON forms accepted (same surface as the reference):
  "name"                         variable (dot-path)
  {"literal": v} | number | bool  literal
  {op: args, **clauses}           operator; args is expr | [expr, ...] |
                                  {var: literal, ...} (pair form)
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from functools import reduce
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["jx_expression", "JXCompiler", "is_missing", "to_bool", "null_if_missing"]


# --------------------------------------------------------------------------
# null/"missing" shims
# --------------------------------------------------------------------------


def is_missing(c: Column) -> Column:
    """JX `missing`: NULL or empty string. Total (never NULL itself).

    The string compare degrades gracefully for non-string columns: a
    non-null numeric never stringifies to "".
    """
    return c.isNull() | (c.cast("string") == F.lit(""))


def null_if_missing(c: Column) -> Column:
    """Normalize the JX missing-domain to SQL NULL ('' -> NULL)."""
    return F.when(~is_missing(c), c)


def to_bool(c: Column) -> Column:
    """Predicate context: missing -> False (collapse 3VL to 2VL).

    try_cast, not cast: the driver's session runs Spark 4 ANSI mode, where
    a plain cast of a malformed string throws at runtime; JX is lenient.
    """
    return F.coalesce(c.try_cast("boolean"), F.lit(False))


def _num(c: Column) -> Column:
    return null_if_missing(c).try_cast("double")


# --------------------------------------------------------------------------
# compiler
# --------------------------------------------------------------------------

_CLAUSE_KEYS = {
    "then",
    "else",
    "default",
    "separator",
    "nulls",
    "prefix",
    "suffix",
    "start",
    "sort",
}

_RELATIVE_RE = re.compile(
    r"^(today|now|eod|tomorrow|yesterday)"
    r"(?:\s*([+-])\s*(\d*)\s*(second|minute|hour|day|week|month|year)s?)?$"
)

_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}


class JXCompiler:
    """Compile JX expression JSON to a pyspark Column.

    ``now`` pins relative-date literals ("today-week") for determinism;
    the reference resolves them against wall-clock at query time
    (vendor/mo_times/dates.py::Date).
    """

    #: ops whose result is already 2-valued (never NULL) -- their outputs
    #: need no missing->False coalesce, keeping predicates pushdown-clean
    TOTAL_BOOL_OPS = frozenset(
        {"and", "or", "not", "eq", "ne", "gt", "gte", "lt", "lte", "in",
         "missing", "exists", "prefix", "suffix", "regex", "regexp"}
    )

    def __init__(self, now: datetime | None = None, dtypes: dict[str, str] | None = None):
        self.now = now or datetime(2024, 1, 1, tzinfo=timezone.utc)
        # optional column-name -> spark sql type string (df.dtypes); enables
        # pushdown-friendly fast paths where '' -normalization is a no-op
        self.dtypes = dtypes or {}

    # -- entry ------------------------------------------------------------

    def compile(self, expr: Any) -> Column:
        if isinstance(expr, Column):
            return expr
        if isinstance(expr, str):
            return F.col(expr)
        if isinstance(expr, bool):
            return F.lit(expr)
        if isinstance(expr, (int, float)):
            return F.lit(expr)
        if expr is None:
            return F.lit(None)
        if isinstance(expr, dict):
            return self._compile_op(expr)
        raise ValueError(f"cannot compile JX expression: {expr!r}")

    def predicate(self, expr: Any) -> Column:
        """Compile for a boolean context (where/when): missing -> False."""
        return self._bool_operand(expr)

    def _bool_operand(self, expr: Any) -> Column:
        """Compile an operand of a boolean context. Expressions built from
        total boolean ops are returned raw (they never yield NULL), so an
        `and` of pushable conjuncts stays a pushable conjunction; anything
        else (bare column, arithmetic) gets the missing->False coalesce."""
        if isinstance(expr, dict):
            keys = set(expr) - _CLAUSE_KEYS
            if len(keys) == 1 and next(iter(keys)) in self.TOTAL_BOOL_OPS:
                return self.compile(expr)
        if isinstance(expr, bool):
            return F.lit(expr)
        return to_bool(self.compile(expr))

    # -- type category inference (for pushdown-friendly fast paths) --------

    _NUMERIC_TYPES = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal", "long")

    def _dtype_cat(self, expr: Any) -> str | None:
        """Best-effort type category of an UNcompiled expression:
        'string' | 'numeric' | 'boolean' | 'timestamp' | None (unknown)."""
        v = None
        if isinstance(expr, dict) and set(expr) == {"literal"}:
            v = expr["literal"]
        elif isinstance(expr, (bool, int, float)):
            v = expr
        if v is not None:
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, (int, float)):
                return "numeric"
            if isinstance(v, str):
                return "string"
            return None
        if isinstance(expr, str):  # variable
            t = self.dtypes.get(expr)
            if t is None:
                return None
            t = t.lower()
            if t == "string":
                return "string"
            if t.startswith(self._NUMERIC_TYPES):
                return "numeric"
            if t.startswith("timestamp") or t == "date":
                return "timestamp"
            if t == "boolean":
                return "boolean"
        return None

    # -- op dispatch --------------------------------------------------------

    def _compile_op(self, expr: dict) -> Column:
        op_keys = [k for k in expr if k not in _CLAUSE_KEYS]
        if not op_keys:
            # prefix/suffix are ops of their own when not clauses of `between`
            op_keys = [k for k in expr if k in ("prefix", "suffix")]
        if "literal" in expr:
            return F.lit(expr["literal"])
        if "when" in expr:
            return self._when(expr)
        if "case" in expr:
            return self._case(expr["case"])
        if len(op_keys) != 1:
            raise ValueError(f"expected single-op expression, got {expr!r}")
        op = op_keys[0]
        args = expr[op]
        handler = getattr(self, f"_op_{op}", None)
        if handler is None:
            raise ValueError(f"unknown JX op {op!r} in {expr!r}")
        return handler(args, expr)

    def _operands(self, args: Any) -> list[Column]:
        """args as expr | [expr, ...] -> columns (pair-form handled by caller)."""
        if isinstance(args, list):
            return [self.compile(a) for a in args]
        return [self.compile(args)]

    def _pairs(self, args: Any) -> list[tuple[Column, Column]] | None:
        """{var: literal, ...} pair form -> [(col, lit)] or None."""
        if isinstance(args, dict):
            return [(F.col(k), F.lit(v)) for k, v in args.items()]
        return None

    # -- E1/E2 literals & variables (handled in compile) --------------------

    def _op_var(self, args, expr):
        return F.col(args)

    # -- E3 boolean ----------------------------------------------------------

    def _op_and(self, args, expr):
        arg_list = args if isinstance(args, list) else [args]
        ops = [self._bool_operand(a) for a in arg_list]
        return reduce(lambda a, b: a & b, ops) if ops else F.lit(True)

    def _op_or(self, args, expr):
        arg_list = args if isinstance(args, list) else [args]
        ops = [self._bool_operand(a) for a in arg_list]
        return reduce(lambda a, b: a | b, ops) if ops else F.lit(False)

    def _op_not(self, args, expr):
        return ~self._bool_operand(args)

    # -- E4 eq/ne (missing==missing is TRUE) ---------------------------------

    def _eq_one(self, a: Column, b: Column) -> Column:
        """JX eq: missing==missing is TRUE; cross-type compare is False,
        never a cast error (ANSI-safe); numeric strings compare numerically
        ("1" == 1.0). Complex (array/struct) operands fall outside this
        scalar shim -- use `script` for those."""
        a, b = null_if_missing(a), null_if_missing(b)
        both_missing = a.isNull() & b.isNull()
        an, bn = a.try_cast("double"), b.try_cast("double")
        val_eq = F.when(
            an.isNotNull() | bn.isNotNull(), an.isNotNull() & an.eqNullSafe(bn)
        ).otherwise(a.cast("string").eqNullSafe(b.cast("string")))
        return both_missing | F.coalesce(val_eq, F.lit(False))

    def _eq_typed(self, ae: Any, be: Any) -> Column:
        """Pick the cheapest JX-correct equality for the operand types.

        Same-category operands skip the cross-type try_cast shim, emitting
        plain EqualNullSafe -- a parquet-pushable predicate -- which is what
        makes `{"eq": {"lang": "es"}}` cost a row-group skip instead of a
        full scan at 100 TB.
        """
        if self._is_array(ae) and not self._is_array(be):
            return self._array_eq_scalar(self.compile(ae), self.compile(be))
        if self._is_array(be) and not self._is_array(ae):
            return self._array_eq_scalar(self.compile(be), self.compile(ae))
        ta, tb = self._dtype_cat(ae), self._dtype_cat(be)
        a, b = self.compile(ae), self.compile(be)
        if ta == tb and ta in ("numeric", "timestamp", "boolean"):
            return a.eqNullSafe(b)  # '' is impossible in these domains
        if ta == tb == "string":
            lit_side = be if isinstance(be, dict) and set(be) == {"literal"} else None
            if lit_side is not None and lit_side["literal"] != "":
                return a.eqNullSafe(b)  # non-missing literal: '' never matches
            return F.nullif(a, F.lit("")).eqNullSafe(F.nullif(b, F.lit("")))
        return self._eq_one(a, b)

    def _op_eq(self, args, expr):
        if isinstance(args, dict):  # conjunction form {"eq": {a: 1, b: 2}}
            terms = [self._eq_typed(k, {"literal": v}) for k, v in args.items()]
            return reduce(lambda x, y: x & y, terms)
        arg_list = args if isinstance(args, list) else [args]
        terms = [self._eq_typed(arg_list[0], o) for o in arg_list[1:]]
        return reduce(lambda x, y: x & y, terms)

    def _op_ne(self, args, expr):
        return ~self._op_eq(args, expr)

    # -- E5 inequalities (missing -> False) -----------------------------------

    def _ineq(self, args, expr, fn):
        if isinstance(args, dict):
            [(k, v)] = args.items()
            ae, be = k, {"literal": v}
        else:
            ae, be = args
        ta, tb = self._dtype_cat(ae), self._dtype_cat(be)
        a, b = self.compile(ae), self.compile(be)
        if ta == tb and ta in ("numeric", "timestamp", "boolean"):
            # missing -> False spelled as a pushable conjunction:
            # IsNotNull(a) AND IsNotNull(b) AND a>b all reach the scan
            return a.isNotNull() & b.isNotNull() & fn(a, b)
        return F.coalesce(fn(null_if_missing(a), null_if_missing(b)), F.lit(False))

    def _op_gt(self, args, expr):
        return self._ineq(args, expr, lambda a, b: a > b)

    def _op_gte(self, args, expr):
        return self._ineq(args, expr, lambda a, b: a >= b)

    def _op_lt(self, args, expr):
        return self._ineq(args, expr, lambda a, b: a < b)

    def _op_lte(self, args, expr):
        return self._ineq(args, expr, lambda a, b: a <= b)

    # -- E6 in ---------------------------------------------------------------

    def _op_in(self, args, expr):
        value, values = args
        c = self.compile(value)
        if isinstance(values, dict) and "literal" in values:
            values = values["literal"]
        if not isinstance(values, list):
            values = [values]
        if self._is_array(value):
            # FlatList/multivalue: any element in the list (ES terms query)
            return F.coalesce(F.arrays_overlap(c, F.lit(values)), F.lit(False))
        return F.coalesce(c.isin(*values), F.lit(False))

    # -- E7 missing/exists -----------------------------------------------------

    def _op_missing(self, args, expr):
        if self._is_array(args):
            return self._array_missing(self.compile(args))
        return is_missing(self.compile(args))

    def _op_exists(self, args, expr):
        if self._is_array(args):
            return ~self._array_missing(self.compile(args))
        return ~is_missing(self.compile(args))

    # -- FlatList / multivalued fields (SURVEY SS1.1 hard spot) ----------------
    # Decision: arrays stay arrays at rest (no ingest flattening); the JX
    # scalar<->list interchangeability surfaces at the OPERATORS: a
    # multivalued field is `missing` when null-or-empty, equals a scalar
    # when ANY element matches, and `in` is any-overlap -- the reference's
    # observable behavior (ES multivalue term semantics; mo_dots FlatList
    # treats a scalar and a 1-list as the same value).

    def _is_array(self, expr: Any) -> bool:
        return isinstance(expr, str) and self.dtypes.get(expr, "").lower().startswith("array")

    @staticmethod
    def _array_missing(c: Column) -> Column:
        return c.isNull() | (F.size(c) == 0)

    def _array_eq_scalar(self, arr: Column, scalar: Column) -> Column:
        both_missing = self._array_missing(arr) & is_missing(scalar)
        any_match = F.exists(arr, lambda e: e.eqNullSafe(scalar))
        return both_missing | F.coalesce(any_match, F.lit(False))

    # -- E8 prefix/suffix (missing pattern -> True) -----------------------------

    def _fix(self, args, expr, fn):
        pairs = self._pairs(args)
        if pairs is not None:
            [(s, p)] = pairs
        else:
            s, p = self._operands(args)
        p = null_if_missing(p)
        return F.when(p.isNull(), F.lit(True)).otherwise(F.coalesce(fn(s, p), F.lit(False)))

    def _op_prefix(self, args, expr):
        return self._fix(args, expr, lambda s, p: s.startswith(p))

    def _op_suffix(self, args, expr):
        return self._fix(args, expr, lambda s, p: s.endswith(p))

    # -- E9 regex (full match) ---------------------------------------------------

    def _op_regex(self, args, expr):
        if isinstance(args, dict):  # pair form {"regex": {field: pattern}}
            [(field, pattern)] = args.items()
            s = F.col(field)
        else:
            s = self.compile(args[0])
            p = args[1]
            pattern = p["literal"] if isinstance(p, dict) else p
        if not isinstance(pattern, str):
            raise ValueError("regex pattern must be a literal string")
        full = "^(?:" + pattern + ")$"  # JX regex is a FULL match
        return F.coalesce(null_if_missing(s).cast("string").rlike(full), F.lit(False))

    def _op_regexp(self, args, expr):
        return self._op_regex(args, expr)

    # -- E10 when/case -------------------------------------------------------------

    def _when(self, expr):
        cond = self.predicate(expr["when"])
        then = self.compile(expr.get("then"))
        els = self.compile(expr.get("else"))
        return F.when(cond, then).otherwise(els)

    def _case(self, whens: list):
        out = None
        default = F.lit(None)
        parts = []
        for w in whens:
            if isinstance(w, dict) and "when" in w:
                parts.append((self.predicate(w["when"]), self.compile(w.get("then"))))
            else:  # trailing default
                default = self.compile(w)
        for cond, then in reversed(parts):
            out = F.when(cond, then).otherwise(default if out is None else out)
        return out if out is not None else default

    # -- E11 coalesce (empty string is missing) --------------------------------------

    def _op_coalesce(self, args, expr):
        return F.coalesce(*[null_if_missing(c) for c in self._operands(args)])

    # -- E12 arithmetic ----------------------------------------------------------------

    def _nary_skip_missing(self, args, zero: float, fold) -> Column:
        ops = [_num(c) for c in self._operands(args)]
        all_missing = reduce(lambda a, b: a & b, [c.isNull() for c in ops])
        total = reduce(fold, [F.coalesce(c, F.lit(zero)) for c in ops])
        return F.when(~all_missing, total)

    def _op_add(self, args, expr):
        return self._nary_skip_missing(args, 0.0, lambda a, b: a + b)

    _op_sum = _op_add  # scalar multi-arg sum, same op in JX

    def _op_mult(self, args, expr):
        return self._nary_skip_missing(args, 1.0, lambda a, b: a * b)

    _op_multiply = _op_mult

    def _op_sub(self, args, expr):
        a, b = (_num(c) for c in self._operands(args))
        return a - b

    _op_subtract = _op_sub
    _op_minus = _op_sub

    def _op_div(self, args, expr):
        a, b = (_num(c) for c in self._operands(args))
        out = F.try_divide(a, b)
        if "default" in expr:
            out = F.coalesce(out, self.compile(expr["default"]))
        return out

    _op_divide = _op_div

    # -- E13 floor(v, interval) -----------------------------------------------------------

    def _op_floor(self, args, expr):
        ops = self._operands(args) if isinstance(args, list) else [self.compile(args)]
        v = _num(ops[0])
        if len(ops) == 1:
            return F.floor(v).cast("double")
        i = _num(ops[1])
        return F.floor(v / i) * i

    # -- E14 mod -----------------------------------------------------------------------------

    def _op_mod(self, args, expr):
        a, b = (_num(c) for c in self._operands(args))
        # guard: pmod by zero raises under ANSI; JX yields missing
        return F.when(b != 0, F.pmod(a, b))

    # -- E15 scalar max/min (null-skipping) ------------------------------------------------------

    def _op_max(self, args, expr):
        ops = [_num(c) for c in self._operands(args)]
        return F.greatest(*ops) if len(ops) > 1 else ops[0]

    _op_most = _op_max

    def _op_min(self, args, expr):
        ops = [_num(c) for c in self._operands(args)]
        return F.least(*ops) if len(ops) > 1 else ops[0]

    _op_least = _op_min

    # -- E16 math ------------------------------------------------------------------------------------

    def _op_abs(self, args, expr):
        return F.abs(_num(self.compile(args)))

    def _op_exp(self, args, expr):
        a, b = (_num(c) for c in self._operands(args))
        return F.pow(a, b)

    _op_power = _op_exp

    def _op_sqrt(self, args, expr):
        return F.sqrt(_num(self.compile(args)))

    # -- E17 length ---------------------------------------------------------------------------------------

    def _op_length(self, args, expr):
        return F.length(null_if_missing(self.compile(args)))

    # -- E18 left/right/not_left/not_right (clamped) ------------------------------------------------------------

    def _str_n(self, args):
        s, n = self._operands(args)
        s = null_if_missing(s).cast("string")
        n = F.greatest(F.coalesce(_num(n), F.lit(0.0)), F.lit(0.0)).try_cast("int")
        return s, n

    def _op_left(self, args, expr):
        s, n = self._str_n(args)
        return s.substr(F.lit(1), n)

    def _op_right(self, args, expr):
        s, n = self._str_n(args)
        ln = F.length(s)
        n2 = F.least(n, ln)
        return s.substr(ln - n2 + 1, n2)

    def _op_not_left(self, args, expr):
        s, n = self._str_n(args)
        ln = F.length(s)
        start = F.least(n, ln) + 1
        return s.substr(start, ln)

    def _op_not_right(self, args, expr):
        s, n = self._str_n(args)
        ln = F.length(s)
        return s.substr(F.lit(1), F.greatest(ln - n, F.lit(0)))

    # -- E19 between {prefix, suffix} ------------------------------------------------------------------------------

    def _op_between(self, args, expr):
        v = null_if_missing(self.compile(args)).cast("string")
        pre = expr.get("prefix")
        suf = expr.get("suffix")
        out = v
        if pre is not None:
            pos = F.instr(out, F.lit(pre))
            out = F.when(pos > 0, out.substr(pos + F.lit(len(pre)), F.length(out)))
        if suf is not None:
            pos2 = F.instr(out, F.lit(suf))
            out = F.when(pos2 > 0, out.substr(F.lit(1), pos2 - F.lit(1)))
        return null_if_missing(out)

    # -- E20 find (0-based; NULL when absent) ---------------------------------------------------------------------------

    def _op_find(self, args, expr):
        raw_sub = args[1] if isinstance(args, list) else None
        s = null_if_missing(self.compile(args[0])).cast("string")
        start = int(expr.get("start", 0))
        if start:
            # locate() exposes a start position but needs a literal needle
            if isinstance(raw_sub, dict) and "literal" in raw_sub:
                raw_sub = raw_sub["literal"]
            if not isinstance(raw_sub, str):
                raise ValueError("find with `start` requires a literal substring")
            idx = F.locate(raw_sub, s, pos=start + 1)
        else:
            sub = null_if_missing(self.compile(args[1])).cast("string")
            idx = F.instr(s, sub)
        return F.when(idx > 0, idx - 1)  # 0-based; NULL (not -1) when absent

    # -- E21 concat (separator, skip missing) ------------------------------------------------------------------------------

    def _op_concat(self, args, expr):
        sep = expr.get("separator", "")
        ops = [null_if_missing(c).cast("string") for c in self._operands(args)]
        return F.concat_ws(sep, *ops)

    # -- E22 split -----------------------------------------------------------------------------------------------------------

    def _op_split(self, args, expr):
        s, sep = self._operands(args)
        return F.split(null_if_missing(s).cast("string"), sep)

    # -- E23 lenient casts ----------------------------------------------------------------------------------------------------

    def _op_number(self, args, expr):
        return null_if_missing(self.compile(args)).try_cast("double")

    def _op_integer(self, args, expr):
        return null_if_missing(self.compile(args)).try_cast("double").try_cast("long")

    def _op_string(self, args, expr):
        return null_if_missing(self.compile(args)).cast("string")

    def _op_boolean(self, args, expr):
        c = null_if_missing(self.compile(args))
        return F.coalesce(
            c.try_cast("boolean"),
            c.cast("string").isin("T", "t", "1", "true", "TRUE"),
        )

    # -- E24 date ---------------------------------------------------------------------------------------------------------------

    def _op_date(self, args, expr):
        if isinstance(args, dict) and "literal" in args:
            args = args["literal"]
        if isinstance(args, str):
            lit = self._parse_date_literal(args)
            if lit is not None:
                # render as a wall-time STRING and cast in the session
                # timezone (UTC-pinned): F.lit(naive datetime) converts
                # through the driver process's OS timezone (mktime), so
                # the same literal meant a different instant on a
                # non-UTC host (r06 TZ=America/New_York sweep)
                return F.lit(lit.strftime("%Y-%m-%d %H:%M:%S.%f")).cast("timestamp")
            return F.lit(args).try_cast("timestamp")
        # expression: unix seconds -> timestamp
        return F.timestamp_seconds(_num(self.compile(args)))

    def _parse_date_literal(self, s: str) -> datetime | None:
        m = _RELATIVE_RE.match(s.strip().lower())
        if not m:
            return None
        from datetime import timedelta

        base_name, sign, count, unit = m.groups()
        now = self.now.replace(tzinfo=None)
        midnight = now.replace(hour=0, minute=0, second=0, microsecond=0)
        base = {
            "today": midnight,
            "eod": midnight + timedelta(days=1),
            "tomorrow": midnight + timedelta(days=1),
            "yesterday": midnight - timedelta(days=1),
            "now": now,
        }[base_name]
        if not sign:
            return base
        n = int(count or "1")
        if sign == "-":
            n = -n
        if unit in _UNIT_SECONDS:
            return base + timedelta(seconds=n * _UNIT_SECONDS[unit])
        # calendar months/years (the reference's Duration distinguishes these)
        month_total = base.month - 1 + (n if unit == "month" else 12 * n)
        year, month = base.year + month_total // 12, month_total % 12 + 1
        import calendar

        day = min(base.day, calendar.monthrange(year, month)[1])
        return base.replace(year=year, month=month, day=day)

    # -- E25 leaves (query-layer; SS `select: "a.*"`) -----------------------------------------------------------------------------

    def _op_leaves(self, args, expr):
        raise ValueError("`leaves` is resolved by the query layer (select a.*), not as a scalar Column")

    # -- E26 tuple ----------------------------------------------------------------------------------------------------------------

    def _op_tuple(self, args, expr):
        return F.array(*self._operands(args))

    # -- E27 get -------------------------------------------------------------------------------------------------------------------

    def _op_get(self, args, expr):
        arr, idx = self._operands(args)
        # JX get is 0-based; element_at is 1-based; try_ variant: out-of-
        # bounds is missing, not an ANSI runtime error
        return F.try_element_at(arr, (null_if_missing(idx).try_cast("int") + F.lit(1)))

    # -- E29 script escape hatch (SQL fragment, not Painless) ---------------------------------------------------------------------------

    def _op_script(self, args, expr):
        if not isinstance(args, str):
            raise ValueError("script op takes a SQL fragment string")
        return F.expr(args)

    # -- E30 union -----------------------------------------------------------------------------------------------------------------------

    def _op_union(self, args, expr):
        ops = self._operands(args)
        return reduce(lambda a, b: F.array_union(a, b), ops)

    # -- E31 scalar count of non-missing operands ---------------------------------------------------------------------------------------------

    def _op_count(self, args, expr):
        ops = self._operands(args)
        return reduce(
            lambda a, b: a + b,
            [(~is_missing(c)).cast("long") for c in ops],
        )


_DEFAULT = JXCompiler()


def jx_expression(expr: Any, compiler: JXCompiler | None = None) -> Column:
    """Compile a JX expression JSON value to a pyspark Column."""
    return (compiler or _DEFAULT).compile(expr)
