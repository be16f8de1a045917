"""Metadata filter: one AST → Catalyst Column compiler.

The reference maintains TWO evaluation paths for the same filter language —
a per-row Python interpreter (metadata.py:305-367) and a SQL string compiler
for DuckDB pushdown (metadata.py:319-412). Compiling the AST to a Catalyst
``Column`` collapses both: the expression participates in predicate
pushdown, partition pruning, and codegen automatically (SURVEY.md §4 O2).

Filter language (parity with metadata.py:149-302):
    field:value            equality
    field:>v  >=v  <v  <=v  !=v     comparisons (numeric or lexicographic)
    field:[v1,v2,...]      IN list
    field:*                field exists
    clauses joined with AND / OR / NOT, parentheses for grouping

Fields resolve against (a) a real column if present, else (b) a JSON
`metadata` string column via get_json_object (metadata.py:390 semantics).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r"""\s*(?:(?P<lpar>\()|(?P<rpar>\))|(?P<op>AND\b|OR\b|NOT\b)
        |(?P<cond>[A-Za-z_][\w.]*:(?:\[[^\]]*\]|[^\s()]+)))""",
    re.VERBOSE | re.IGNORECASE,
)


@dataclass
class Cond:
    field: str
    op: str          # eq, ne, gt, ge, lt, le, in, exists
    value: object


def tokenize_filter(s: str) -> list:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            if s[pos:].strip():
                raise ValueError(f"bad filter syntax at: {s[pos:]!r}")
            break
        pos = m.end()
        if m.group("lpar"):
            out.append("(")
        elif m.group("rpar"):
            out.append(")")
        elif m.group("op"):
            out.append(m.group("op").upper())
        else:
            out.append(_parse_cond(m.group("cond")))
    return out


def _parse_cond(s: str) -> Cond:
    field, raw = s.split(":", 1)
    if raw == "*":
        return Cond(field, "exists", None)
    if raw.startswith("["):
        vals = [v.strip() for v in raw[1:-1].split(",") if v.strip()]
        return Cond(field, "in", vals)
    for pfx, op in ((">=", "ge"), ("<=", "le"), (">", "gt"), ("<", "lt"),
                    ("!=", "ne")):
        if raw.startswith(pfx):
            return Cond(field, op, raw[len(pfx):])
    return Cond(field, "eq", raw)


def parse_filter(s: str) -> list:
    """→ RPN (shunting-yard; NOT > AND > OR, parity with the reference's
    recursive parser precedence, metadata.py:220-302)."""
    prec = {"NOT": 3, "AND": 2, "OR": 1}
    out, stack = [], []
    for tok in tokenize_filter(s):
        if isinstance(tok, Cond):
            out.append(tok)
        elif tok == "(":
            stack.append(tok)
        elif tok == ")":
            while stack and stack[-1] != "(":
                out.append(stack.pop())
            if not stack:
                raise ValueError("unbalanced parentheses")
            stack.pop()
        else:
            while (stack and stack[-1] != "(" and
                   prec.get(stack[-1], 0) >= prec[tok]):
                out.append(stack.pop())
            stack.append(tok)
    while stack:
        if stack[-1] == "(":
            raise ValueError("unbalanced parentheses")
        out.append(stack.pop())
    return out


def _field_col(df: DataFrame, field: str,
               metadata_col: str = "metadata") -> Column:
    if field in df.columns:
        return F.col(field)
    return F.get_json_object(F.col(metadata_col), f"$.{field}")


def _try_num(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def _cond_to_column(df: DataFrame, c: Cond, metadata_col: str) -> Column:
    col = _field_col(df, c.field, metadata_col)
    if c.op == "exists":
        return col.isNotNull()
    if c.op == "in":
        return col.cast("string").isin([str(v) for v in c.value])
    num = _try_num(c.value)
    lhs = col.cast("double") if num is not None else col.cast("string")
    rhs = F.lit(num) if num is not None else F.lit(str(c.value))
    return {
        "eq": lhs == rhs, "ne": lhs != rhs, "gt": lhs > rhs,
        "ge": lhs >= rhs, "lt": lhs < rhs, "le": lhs <= rhs,
    }[c.op]


def compile_filter(df: DataFrame, expr: str,
                   metadata_col: str = "metadata") -> Column:
    """Filter string → Catalyst Column (pushdown-eligible)."""
    rpn = parse_filter(expr)
    if not rpn:
        return F.lit(True)
    stack: list[Column] = []
    for tok in rpn:
        if isinstance(tok, Cond):
            stack.append(_cond_to_column(df, tok, metadata_col))
        elif tok == "NOT":
            stack.append(~stack.pop())
        else:
            b, a = stack.pop(), stack.pop()
            stack.append((a & b) if tok == "AND" else (a | b))
    if len(stack) != 1:
        raise ValueError("malformed filter expression")
    return stack[0]


def apply_filter(df: DataFrame, expr: str,
                 metadata_col: str = "metadata") -> DataFrame:
    return df.where(compile_filter(df, expr, metadata_col))
