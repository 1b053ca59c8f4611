"""litfast: single-gateway-call literal builders must be value-identical to
the per-element F.lit construction they replace (PLANS.md section 6.15)."""

import math

import pytest
from pyspark.sql import functions as F

from nutch_spark.functions.litfast import (
    lit_double_array,
    lit_str_array,
    lit_str_map,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


TRICKY_STRINGS = [
    "plain",
    "langue d'oc",          # single quote
    "back\\slash",          # backslash
    "both\\'mixed",         # backslash then quote
    "two''quotes",
    "",                      # empty string element
    "tab\tand newline\n",
    "unicode: é中文",
    "%s %d {braces} $dollar",
]


def test_str_map_matches_create_map(spark):
    d = {k: k.upper() + "-v" for k in TRICKY_STRINGS}
    fast = _one(spark, lit_str_map(d))
    slow = _one(
        spark, F.create_map(*[F.lit(x) for kv in d.items() for x in kv])
    )
    assert fast == slow == d


def test_str_map_empty(spark):
    assert _one(spark, lit_str_map({})) == {}


def test_str_array_matches_array(spark):
    fast = _one(spark, lit_str_array(TRICKY_STRINGS))
    slow = _one(spark, F.array(*[F.lit(x) for x in TRICKY_STRINGS]))
    assert fast == slow == TRICKY_STRINGS


def test_str_array_empty(spark):
    assert _one(spark, lit_str_array([])) == []


TRICKY_DOUBLES = [
    0.1,                     # classic non-terminating binary fraction
    -0.0,
    1e-310,                  # subnormal
    1.7976931348623157e308,  # max double
    5e-324,                  # min subnormal
    2.0 / 3.0,
    -123456.789e-12,
    float("inf"),
    float("-inf"),
    0.0,
    1.0,
]


def test_double_array_exact_bits(spark):
    got = _one(spark, lit_double_array(TRICKY_DOUBLES))
    for g, want in zip(got, TRICKY_DOUBLES):
        # exact bit equality, not approx: repr -> Double.parseDouble must
        # round-trip (math.isclose would hide a one-ulp drift)
        assert (g == want and math.copysign(1, g) == math.copysign(1, want)), (
            g,
            want,
        )


def test_double_array_nan(spark):
    got = _one(spark, lit_double_array([float("nan")]))
    assert len(got) == 1 and math.isnan(got[0])


def test_double_array_matches_lit_chain(spark):
    finite = [x for x in TRICKY_DOUBLES if math.isfinite(x)]
    fast = _one(spark, lit_double_array(finite))
    slow = _one(spark, F.array(*[F.lit(float(x)) for x in finite]))
    assert fast == slow


def test_double_array_type_is_double(spark):
    df = spark.range(1).select(lit_double_array([1.5]).alias("v"))
    # a bare SQL 1.5 would be DECIMAL(2,1); the cast-from-string must yield
    # array<double> so downstream arithmetic keeps IEEE semantics
    assert df.schema["v"].dataType.simpleString() == "array<double>"
    df2 = spark.range(1).select(lit_str_array(["x"]).alias("v"))
    assert df2.schema["v"].dataType.simpleString() == "array<string>"


def test_foldable_constant(spark):
    # the SQL-parsed collection must constant-fold: no per-row evaluation in
    # the optimized plan (shows as a Literal, not function calls)
    df = spark.range(3).select(lit_double_array([1.0, 2.5]).alias("v"))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "array(" not in plan.lower() or "cast(" not in plan.lower(), plan


@pytest.mark.parametrize("n", [533])
def test_large_map_single_call(spark, n):
    # the motivating case: a LANGUAGES_MAP-sized literal built in one call
    d = {f"k{i}": f"v{i}" for i in range(n)}
    got = _one(spark, lit_str_map(d))
    assert got == d
