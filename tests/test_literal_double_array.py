"""literal_double_array (r15 optimization #6): the one-parse SQL literal
must be BIT-identical to the F.lit form for every finite double, flat and
nested — a parser/formatting regression would silently skew all 13+ LSH/
centroid/codebook call sites (ADVICE r15: the equivalence was only checked
ad hoc in-session; this pins it)."""

import math
import random
import struct

import pytest
from pyspark.sql import functions as F

from qcardia_data_spark.functions.arrays import literal_double_array


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


EDGE = [
    0.0,
    -0.0,
    1.0,
    -1.0,
    0.1,
    -0.1,
    1e-300,
    -1e-300,
    1e300,
    -1e300,
    5e-324,            # smallest subnormal
    -5e-324,
    2.2250738585072014e-308,   # smallest normal
    4.9406564584124654e-324,
    1.7976931348623157e308,    # largest finite
    -1.7976931348623157e308,
    2.675,             # classic shortest-repr cases
    0.30000000000000004,
    1 / 3,
    2 / 3,
    math.pi,
    math.e,
    123456789.123456789,
    9007199254740993.0,        # > 2^53
]


def _collect_doubles(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_flat_bit_identity_random_and_edge(spark):
    rng = random.Random(0xC0FFEE)
    vals = list(EDGE)
    for _ in range(200):
        # random bit patterns, re-drawn until finite (covers subnormals,
        # extreme exponents, every mantissa shape)
        while True:
            x = struct.unpack("<d", struct.pack("<Q", rng.getrandbits(64)))[0]
            if math.isfinite(x):
                vals.append(x)
                break
    got = _collect_doubles(spark, literal_double_array(vals))
    want = _collect_doubles(spark, F.lit(vals))
    assert len(got) == len(want) == len(vals)
    for g, w, v in zip(got, want, vals):
        assert _bits(g) == _bits(w), (v, g, w)


def test_nested_bit_identity(spark):
    rng = random.Random(42)
    mat = [
        [struct.unpack("<d", struct.pack("<Q", rng.getrandbits(63)))[0]
         for _ in range(8)]
        for _ in range(4)
    ] + [EDGE[:8], EDGE[8:16]]
    got = _collect_doubles(spark, literal_double_array(mat))
    want = _collect_doubles(spark, F.lit(mat))
    assert [[_bits(x) for x in row] for row in got] == [
        [_bits(x) for x in row] for row in want
    ]


def test_schema_matches_lit(spark):
    for v in ([1.0, 2.0], [[1.0], [2.0]]):
        a = spark.range(1).select(literal_double_array(v).alias("v")).schema
        b = spark.range(1).select(F.lit(v).alias("v")).schema
        assert a == b


def test_nonfinite_and_empty_fall_back_to_lit(spark):
    # non-finite: no SQL literal — must behave exactly like F.lit
    for v in ([float("nan"), 1.0], [float("inf")], [1.0, float("-inf")]):
        got = _collect_doubles(spark, literal_double_array(v))
        want = _collect_doubles(spark, F.lit(v))
        assert [_bits(g) if g == g else "nan" for g in got] == [
            _bits(w) if w == w else "nan" for w in want
        ]
    # empty list: SQL array() would type as array<string> — the guard
    # must route through F.lit (VERDICT r15 hardening #5)
    a = spark.range(1).select(literal_double_array([]).alias("v")).schema
    b = spark.range(1).select(F.lit([]).alias("v")).schema
    assert a == b


def test_int_inputs_coerce_like_floats(spark):
    # callers pass [1, -1] sign rows; the literal must render them as the
    # exact doubles float() produces
    got = _collect_doubles(spark, literal_double_array([1, -1, 0]))
    assert [_bits(g) for g in got] == [_bits(1.0), _bits(-1.0), _bits(0.0)]
