"""SmallFloat quantization properties + cross-form parity."""

import random

import duckdb
import numpy as np

from solr_spark.functions.smallfloat import (
    DECODE_TABLE,
    NUM_FREE_VALUES,
    byte4_to_int,
    int_to_byte4,
    quantize_col,
    quantize_np,
    quantize_sql,
)


def test_basic_properties():
    assert NUM_FREE_VALUES == 24
    # identity range
    for i in range(NUM_FREE_VALUES):
        assert int_to_byte4(i) == i and byte4_to_int(i) == i
    # table strictly increasing
    assert all(b > a for a, b in zip(DECODE_TABLE, DECODE_TABLE[1:]))
    # round-trip: decode(encode(x)) <= x, and is a fixpoint
    rng = random.Random(1)
    xs = [rng.randint(0, 2**31 - 1) for _ in range(2000)] + list(range(300))
    for x in xs:
        d = byte4_to_int(int_to_byte4(x))
        assert d <= x
        assert byte4_to_int(int_to_byte4(d)) == d
    # encode monotone
    enc = [int_to_byte4(x) for x in range(100000)]
    assert all(b >= a for a, b in zip(enc, enc[1:]))


def test_numpy_matches_scalar():
    xs = np.array([0, 1, 23, 24, 25, 39, 40, 64, 1000, 123456, 2**31 - 1])
    expect = np.array([byte4_to_int(int_to_byte4(int(x))) for x in xs])
    assert (quantize_np(xs) == expect).all()


def test_duckdb_matches(spark):
    xs = [0, 1, 23, 24, 25, 39, 40, 64, 100, 571, 1000, 9999]
    con = duckdb.connect()
    got = con.execute(
        f"select {quantize_sql('x')} from (select unnest(?::bigint[]) as x)", [xs]
    ).fetchall()
    expect = [byte4_to_int(int_to_byte4(x)) for x in xs]
    assert [g[0] for g in got] == expect
    # spark column form
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    rows = df.select(quantize_col("x").alias("q")).collect()
    assert [r.q for r in rows] == expect
