"""Single-round-trip builders for large literal collections.

`F.create_map(*[F.lit(x) ...])` / `F.array(*[F.lit(x) ...])` cost TWO py4j
gateway round-trips per element (lit + the varargs marshalling), ~0.45 ms
each on this box — the 533-entry language alias map alone added ~2.5 s and
the IVF centroid array ~12 s to a cold plan build (PLANS.md §6.15). The
builders below hand the WHOLE collection to the JVM as one SQL fragment via
a single `F.expr` call; the parser builds the identical foldable
CreateMap/CreateArray(Literal…) tree JVM-side, so the optimized plan — and
therefore every query result — is unchanged.

Doubles ride as `CAST('<repr>' AS DOUBLE)`: Python's repr is the shortest
round-tripping decimal form and Java's Double.parseDouble restores the
exact same IEEE double, then ConstantFolding collapses the cast. (A bare
SQL `1.5` would be DECIMAL(2,1), not double — hence the cast-from-string.)
"""

from __future__ import annotations

import math
from typing import Iterable, Mapping

from pyspark.sql import Column, functions as F


def _q(s: str) -> str:
    """SQL single-quoted string literal (backslash escapes are on by
    default in Spark's lexer, so both need doubling)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def lit_str_map(d: Mapping[str, str]) -> Column:
    """map<string,string> literal in one gateway call."""
    if not d:
        return F.create_map().cast("map<string,string>")
    items = ", ".join(f"{_q(k)}, {_q(v)}" for k, v in d.items())
    return F.expr(f"map({items})")


def lit_str_array(xs: Iterable[str]) -> Column:
    """array<string> literal in one gateway call."""
    xs = list(xs)
    if not xs:
        return F.array().cast("array<string>")
    return F.expr("array(" + ", ".join(_q(x) for x in xs) + ")")


def _d(x: float) -> str:
    if math.isnan(x):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(x):
        return f"CAST('{'-' if x < 0 else ''}Infinity' AS DOUBLE)"
    return f"CAST('{x!r}' AS DOUBLE)"


def lit_double_array(xs: Iterable[float]) -> Column:
    """array<double> literal in one gateway call, exact to the bit
    (repr -> Double.parseDouble round-trip)."""
    xs = [float(x) for x in xs]
    if not xs:
        return F.array().cast("array<double>")
    return F.expr("array(" + ", ".join(_d(x) for x in xs) + ")")
