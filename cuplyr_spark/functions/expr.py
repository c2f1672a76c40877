"""R/dplyr-style expression compiler: string -> pyspark Column.

The reference parses verb arguments textually into (col, op, rhs)
triples and nested binary trees (cuplyr ``R/mutate.R:180-394``,
``R/filter.R:137-244``). Here the string is parsed with Python's
``ast`` module and compiled directly to Column expressions, so the
whole reference grammar — and much more — works:

- arithmetic ``+ - * /`` with Spark/Catalyst type promotion;
- ``^`` is POWER (R semantics; Spark SQL would read it as XOR — the
  compiler is exactly what prevents that divergence); ``**`` too;
- ``%`` is MOD and ``//`` is floor-division (the kernel-level ``%%``
  and ``%/%`` of ``src/ops_common.hpp:21-30``);
- comparisons ``== != < <= > >=``, chained comparisons, ``in`` ->
  ``isin``;
- boolean ``and/or/not`` and ``& | ~``;
- literals (int/float/str/True/False/None), unary minus;
- function calls resolved against an R-names table (``ceiling`` ->
  ``ceil``, ``is_na``/``is.na`` -> ``isnull`` …) then against
  ``pyspark.sql.functions``;
- ``if_else(cond, a, b)`` -> CASE WHEN.

Anything that is not valid Python syntax (e.g. SQL like
``CAST(x AS INT)`` or ``date '1998-09-02'``) falls back to
``F.expr`` — Spark SQL remains a first-class escape hatch.
"""

from __future__ import annotations

import ast
import functools
import operator
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# R-name -> pyspark.sql.functions name (identity entries omitted: any
# name not listed is tried against F directly).
_FN_ALIASES = {
    "ceiling": "ceil",
    "trunc": "expr_trunc",  # handled specially (F.trunc is for dates)
    "is_na": "isnull",
    "is.na": "isnull",
    "str_length": "length",
    "str_to_lower": "lower",
    "str_to_upper": "upper",
    "str_trim": "trim",
    "str_replace": "expr_str_replace",
    "str_remove": "expr_str_remove",
    "str_replace_all": "regexp_replace",
    "str_detect": "rlike",
    "str_starts": "startswith",
    "str_ends": "endswith",
    "str_count": "regexp_count",
    "str_split": "split",
    "str_squish": "expr_str_squish",
    "str_pad": "expr_str_pad",
    "str_dup": "repeat",
    "str_c": "concat",
    "str_to_title": "initcap",
    "str_extract": "expr_str_extract",
    "str_remove_all": "expr_str_remove_all",
    "str_sub": "expr_str_sub",
    "floor_date": "expr_floor_date",
    "wday": "dayofweek",
    "yday": "dayofyear",
    "mday": "dayofmonth",
    "cast": "expr_cast",
    "n_distinct": "count_distinct",
    "paste0": "concat",
    "if_else": "expr_if_else",
    "ifelse": "expr_if_else",
    "coalesce": "coalesce",
    # dplyr vector helpers
    "na_if": "expr_na_if",
    "replace_na": "coalesce",  # replace_na(x, v) == coalesce(x, v)
    "between": "expr_between",
    "pmin": "expr_pmin",
    "pmax": "expr_pmax",
}

# R coercion functions -> Spark cast targets (callable in the R-style
# grammar, where SQL `CAST(x AS t)` syntax isn't available).
_COERCIONS = {
    "as_integer": "int",
    "as_long": "bigint",
    "as_numeric": "double",
    "as_double": "double",
    "as_character": "string",
    "as_logical": "boolean",
    "as_date": "date",
}

_BIN_OPS = {
    ast.Add: operator.add,
    ast.Sub: operator.sub,
    ast.Mult: operator.mul,
    ast.Div: operator.truediv,
    ast.Mod: operator.mod,
    ast.Pow: lambda a, b: F.pow(a, b),
    ast.BitXor: lambda a, b: F.pow(a, b),  # R: ^ is power
    ast.FloorDiv: lambda a, b: F.floor(a / b),  # R: %/%
    ast.BitAnd: operator.and_,
    ast.BitOr: operator.or_,
}

_CMP_OPS = {
    ast.Eq: operator.eq,
    ast.NotEq: operator.ne,
    ast.Lt: operator.lt,
    ast.LtE: operator.le,
    ast.Gt: operator.gt,
    ast.GtE: operator.ge,
}


class ExprError(ValueError):
    pass


def _shift_group_refs(pat: str, repl: str) -> str:
    """Rewrite an R/ICU replacement string (backrefs ``\\N``) into Java
    replacement syntax (``$N``) with every group number shifted by one,
    because the compiled pattern gains a synthetic prefix group ``$1``
    (the first-match-only anchor in expr_str_replace).

    Escape-aware, unlike a bare regex sub:
    - ``\\\\`` (literal backslash) passes through untouched — a following
      digit is literal text, not a group ref;
    - ``\\0`` (whole-match ref) is rejected: the Java pattern's group 0
      would include the synthetic prefix, silently duplicating text;
    - multi-digit refs bind like regex engines do — the longest digit run
      that is a valid group number of ``pat`` (so ``\\10`` with a 1-group
      pattern is group 1 + literal "0");
    - refs beyond the pattern's group count are an error, matching
      stringr/ICU behavior;
    - ``$`` is escaped for Java's replacement grammar.
    """
    try:
        n_groups = re.compile(pat).groups
    except re.error:
        n_groups = 9  # Java-only syntax Python can't parse; assume max
    out = []
    i = 0
    while i < len(repl):
        ch = repl[i]
        if ch == "$":
            out.append("\\$")
            i += 1
        elif ch == "\\" and i + 1 < len(repl):
            nxt = repl[i + 1]
            if nxt == "\\":
                out.append("\\\\")
                i += 2
            elif nxt.isdigit():
                j = i + 1
                while j < len(repl) and repl[j].isdigit():
                    j += 1
                digits = repl[i + 1 : j]
                # longest prefix that is a valid group number
                while len(digits) > 1 and int(digits) > n_groups:
                    digits = digits[:-1]
                num = int(digits)
                if num == 0:
                    # plain ValueError: must surface to the user, not
                    # trigger compile_expr's Spark-SQL fallback
                    raise ValueError(
                        "\\0 (whole-match backreference) is not supported "
                        "in str_replace replacements"
                    )
                if num > n_groups:
                    raise ValueError(
                        f"backreference \\{num} exceeds the pattern's "
                        f"{n_groups} group(s)"
                    )
                out.append("$" + str(num + 1))
                i += 1 + len(digits)
            else:
                out.append(ch + nxt)
                i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _raw(node: ast.AST):
    """Literal value of a constant argument (for pyspark functions that
    require raw Python str/int, not a Column)."""
    try:
        return ast.literal_eval(node)
    except (ValueError, SyntaxError):
        raise ExprError("argument must be a literal constant")


def compile_expr(text: str, columns=None) -> Column:
    """Compile an expression string to a Column.

    Tries the R-style grammar first; falls back to Spark SQL
    (``F.expr``) when the string isn't valid Python syntax.
    ``columns``, when given, is the frame's top-level column names —
    threaded down the recursive compile as a parameter (the engine
    runs driver threads, so no module-global context) and used to
    resolve dotted names as struct-field access when no flat column
    carries the dotted name (multimodal metadata predicates like
    ``meta.n_chars < 200``).
    """
    try:
        tree = ast.parse(text, mode="eval")
    except SyntaxError:
        return F.expr(text)
    known = frozenset(columns) if columns is not None else None
    try:
        return _compile(tree.body, known)
    except ExprError:
        # Parsed as Python but uses something only Spark SQL knows.
        return F.expr(text)


def _compile(node: ast.AST, known: frozenset | None) -> Column:
    if isinstance(node, ast.Constant):
        return F.lit(node.value)
    if isinstance(node, ast.Name):
        return F.col(node.id)
    if isinstance(node, ast.Attribute):
        # Dotted names produced by this engine (join suffixes `v.x`,
        # bind_cols repairs) are top-level columns, not struct fields —
        # UNLESS the caller supplied the frame's columns and no flat
        # column carries the dotted name while the base is a real
        # column: then it's a struct-field access (`meta.n_chars`).
        parts = []
        cur: ast.AST = node
        while isinstance(cur, ast.Attribute):
            parts.append(cur.attr)
            cur = cur.value
        if not isinstance(cur, ast.Name):
            raise ExprError("unsupported attribute base")
        parts.append(cur.id)
        parts.reverse()
        name = ".".join(parts)
        if (
            known is not None
            and name not in known
            and parts[0] in known
        ):
            out = F.col("`" + parts[0].replace("`", "``") + "`")
            for fld in parts[1:]:
                out = out.getField(fld)
            return out
        return F.col("`" + name.replace("`", "``") + "`")
    if isinstance(node, ast.BinOp):
        fn = _BIN_OPS.get(type(node.op))
        if fn is None:
            raise ExprError(f"unsupported operator {ast.dump(node.op)}")
        return fn(_compile(node.left, known), _compile(node.right, known))
    if isinstance(node, ast.UnaryOp):
        if isinstance(node.op, ast.USub):
            return -_compile(node.operand, known)
        if isinstance(node.op, (ast.Not, ast.Invert)):
            return ~_compile(node.operand, known)
        raise ExprError("unsupported unary op")
    if isinstance(node, ast.BoolOp):
        op = operator.and_ if isinstance(node.op, ast.And) else operator.or_
        cols = [_compile(v, known) for v in node.values]
        out = cols[0]
        for c in cols[1:]:
            out = op(out, c)
        return out
    if isinstance(node, ast.Compare):
        out = None
        left = _compile(node.left, known)
        for cmp_op, comparator in zip(node.ops, node.comparators):
            if isinstance(cmp_op, (ast.In, ast.NotIn)):
                if not isinstance(comparator, (ast.List, ast.Tuple, ast.Set)):
                    raise ExprError("`in` needs a literal list")
                values = [ast.literal_eval(e) for e in comparator.elts]
                piece = left.isin(values)
                if isinstance(cmp_op, ast.NotIn):
                    piece = ~piece
            else:
                fn = _CMP_OPS.get(type(cmp_op))
                if fn is None:
                    raise ExprError("unsupported comparison")
                right = _compile(comparator, known)
                piece = fn(left, right)
                left = right  # chained comparisons: a < b < c
            out = piece if out is None else (out & piece)
        return out
    if isinstance(node, ast.Call):
        return _compile_call(node, known)
    if isinstance(node, ast.IfExp):
        return F.when(
            _compile(node.test, known), _compile(node.body, known)
        ).otherwise(_compile(node.orelse, known))
    raise ExprError(f"unsupported syntax: {ast.dump(node)[:60]}")


def _compile_call(node: ast.Call, known: frozenset | None) -> Column:
    if not isinstance(node.func, ast.Name):
        raise ExprError("only simple function names are supported")
    name = _FN_ALIASES.get(node.func.id, node.func.id)
    args = [_compile(a, known) for a in node.args]
    if name == "expr_if_else":
        if len(args) != 3:
            raise ExprError("if_else(cond, yes, no)")
        return F.when(args[0], args[1]).otherwise(args[2])
    if name == "expr_na_if":
        # dplyr na_if(x, y): NULL where x == y, else x
        if len(args) != 2:
            raise ExprError("na_if(x, y)")
        return F.when(args[0] == args[1], F.lit(None)).otherwise(args[0])
    if name == "expr_between":
        # dplyr between(x, lo, hi): inclusive both ends
        if len(args) != 3:
            raise ExprError("between(x, lo, hi)")
        return (args[0] >= args[1]) & (args[0] <= args[2])
    if name in ("expr_pmin", "expr_pmax"):
        # R pmin/pmax propagate NA (na.rm=FALSE default); Spark's
        # least/greatest SKIP nulls, so guard explicitly.
        if len(args) < 2:
            raise ExprError("pmin/pmax need at least two arguments")
        inner = F.least(*args) if name == "expr_pmin" else F.greatest(*args)
        any_null = functools.reduce(operator.or_, [a.isNull() for a in args])
        return F.when(any_null, F.lit(None)).otherwise(inner)
    if name == "expr_trunc":
        # R trunc(): toward zero. Spark F.trunc is date-only.
        (x,) = args
        return F.when(x < 0, F.ceil(x)).otherwise(F.floor(x)).cast("double")
    if name == "expr_cast":
        return args[0].cast(_raw(node.args[1]))
    if name in _COERCIONS:
        return args[0].cast(_COERCIONS[name])
    if name == "expr_str_sub":
        # R str_sub(x, start, end): 1-based INCLUSIVE end ->
        # substring(x, start, end - start + 1). Positive indices only.
        start, end = _raw(node.args[1]), _raw(node.args[2])
        return F.substring(args[0], start, end - start + 1)
    if name in ("expr_str_replace", "expr_str_remove"):
        # R stringr::str_replace / str_remove: FIRST match only.
        # Spark's regexp_replace is replace-all, so anchor a non-greedy
        # any-prefix group: ^([\s\S]*?)(?:pat) can match at most once.
        # ([\s\S] instead of (?s). so the user pattern's own `.`
        # semantics are untouched.) Group refs \N in the replacement
        # shift to Java's $(N+1) — group 1 is the prefix — and literal
        # `$` must be escaped for Java's replacement syntax.
        pat = _raw(node.args[1])
        repl = _raw(node.args[2]) if name == "expr_str_replace" else ""
        repl = _shift_group_refs(pat, repl)
        return F.regexp_replace(
            args[0], "^([\\s\\S]*?)(?:" + pat + ")", "$1" + repl
        )
    if name == "expr_str_squish":
        # stringr str_squish: trim + collapse internal whitespace runs
        (x,) = args
        return F.regexp_replace(F.trim(x), r"\s+", " ")
    if name == "expr_str_pad":
        # stringr str_pad(x, width, side="left", pad=" "): pads to
        # width but — unlike Spark's lpad/rpad — NEVER truncates a
        # longer string; side="both" puts floor(extra/2) on the left.
        if not 2 <= len(node.args) <= 4:
            raise ExprError("str_pad(x, width, side=, pad=)")
        x = args[0]
        width = _raw(node.args[1])
        side = _raw(node.args[2]) if len(node.args) > 2 else "left"
        pad = _raw(node.args[3]) if len(node.args) > 3 else " "
        if side not in ("left", "right", "both") or len(pad) != 1:
            raise ExprError("str_pad: side in left/right/both, 1-char pad")
        padstr = F.lit(pad * max(width, 1))
        need = F.greatest(F.lit(width) - F.length(x), F.lit(0))
        if side == "left":
            ln, rn = need, F.lit(0)
        elif side == "right":
            ln, rn = F.lit(0), need
        else:
            ln = F.floor(need / 2).cast("int")
            rn = need - ln
        return F.concat(
            F.substring(padstr, F.lit(1), ln),
            x,
            F.substring(padstr, F.lit(1), rn),
        )
    if name == "expr_str_extract":
        return F.regexp_extract(args[0], _raw(node.args[1]), 1)
    if name == "expr_str_remove_all":
        return F.regexp_replace(args[0], _raw(node.args[1]), "")
    if name == "expr_floor_date":
        # lubridate arg order (x, unit) -> Spark date_trunc(unit, x)
        return F.date_trunc(_raw(node.args[1]), args[0])
    fn = getattr(F, name, None)
    if fn is None or not callable(fn):
        raise ExprError(f"unknown function {name!r}")
    try:
        return fn(*args)
    except TypeError:
        # Some pyspark functions demand raw Python literals for
        # pattern/index args (e.g. regexp_extract's idx) — retry with
        # literal constants un-wrapped.
        raw_args = [
            _raw(a) if isinstance(a, ast.Constant) else c
            for a, c in zip(node.args, args)
        ]
        return fn(*raw_args)


def case_when(*cases, default=None) -> Column:
    """dplyr case_when: ``case_when((cond, value), ..., default=v)``.
    Conditions may be string expressions (compiled by this module) or
    Columns; first match wins, no match -> ``default`` (NULL if omitted).
    """
    out = None
    for cond, value in cases:
        c = compile_expr(cond) if isinstance(cond, str) else cond
        v = value if isinstance(value, Column) else F.lit(value)
        out = F.when(c, v) if out is None else out.when(c, v)
    if out is None:
        raise ExprError("case_when needs at least one (condition, value) pair")
    if default is not None:
        d = default if isinstance(default, Column) else F.lit(default)
        out = out.otherwise(d)
    return out


def collate(col: Column | str, collation: str = "UTF8_LCASE") -> Column:
    """Collation-aware string comparison/sort key (Spark 4 collations).

    The reference documents binary-UTF-8 ordering only
    (``/root/reference/R/arrange.R:41``); this is the upgrade Spark 4
    enables: ``frame.arrange(collate("name"), "id")`` sorts
    case-insensitively (``UTF8_LCASE``) or by ICU locale rules
    (e.g. ``"UNICODE_CI"``) while leaving the column's bytes
    untouched. Collation rides the sort expression, so Catalyst still
    plans a normal range-partitioned sort / TakeOrderedAndProject.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.collate(c, collation)
