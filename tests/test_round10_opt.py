"""Round-10 optimization regression tests.

Pins the equivalences the r10 restructures rely on:

* cosine_hoisted (per-side double cast + squared norm hoisted below a
  pair join) is BIT-identical to the per-pair cosine() fold — including
  the zero-norm NaN guard — because dot(v, v) is the same left-to-right
  fold and the denominator is sqrt(n2a * n2b) in both forms.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ght2dm_spark.operators.similarity import (
    as_double,
    cosine,
    cosine_hoisted,
    dot,
    with_norm2,
)


def test_cosine_hoisted_bit_identical_to_cosine(spark):
    rows = [
        (1, [0.1, -0.25, 3.5, 0.0]),
        (2, [1.0, 1.0, 1.0, 1.0]),
        (3, [-2.5, 0.125, 7.0, -0.3]),
        (4, [0.0, 0.0, 0.0, 0.0]),  # zero vector: NaN guard path
        (5, [1e-30, -1e30, 2.0, 0.5]),
    ]
    df = spark.createDataFrame(rows, "id long, v array<float>")
    a = with_norm2(df, "v", "a").select(
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        "a_nd",
        "a_n2",
    )
    b = with_norm2(df, "v", "b").select(
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        "b_nd",
        "b_n2",
    )
    pairs = a.crossJoin(b)
    out = pairs.select(
        "id_a",
        "id_b",
        cosine(as_double(F.col("va")), as_double(F.col("vb"))).alias("c0"),
        cosine_hoisted(
            F.col("a_nd"), F.col("a_n2"), F.col("b_nd"), F.col("b_n2")
        ).alias("c1"),
    ).collect()
    assert len(out) == len(rows) ** 2
    saw_nan = False
    import struct

    for r in out:
        b0 = struct.pack("<d", r["c0"])
        b1 = struct.pack("<d", r["c1"])
        if math.isnan(r["c0"]):
            saw_nan = True
            assert math.isnan(r["c1"])
        else:
            assert b0 == b1, (r["id_a"], r["id_b"], r["c0"], r["c1"])
    assert saw_nan  # the zero-vector row exercised the guard


def test_with_norm2_matches_manual_fold(spark):
    df = spark.createDataFrame(
        [(1, [1.5, -2.0, 0.25])], "id long, v array<float>"
    )
    got = with_norm2(df, "v", "x").select("x_n2").collect()[0][0]
    want = (
        df.select(
            dot(as_double(F.col("v")), as_double(F.col("v"))).alias("n2")
        ).collect()[0][0]
    )
    import struct

    assert struct.pack("<d", got) == struct.pack("<d", want)
