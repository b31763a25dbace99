"""Mirror of the driver's correctness gate: every queries() entry vs its
oracle_sql() twin on DuckDB, at sf0.01 — row count, schema width, and
exact (order-insensitive) value equality."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(float)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _compare(name, sdf, ddf):
    s, d = _norm(sdf), _norm(ddf)
    assert list(s.columns) == list(d.columns), f"{name}: columns {list(s.columns)} != {list(d.columns)}"
    assert len(s) == len(d), f"{name}: rows {len(s)} != {len(d)}"
    for c in s.columns:
        a, b = s[c].tolist(), d[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if isinstance(x, float) or isinstance(y, float):
                ok = (math.isnan(x) and math.isnan(y)) or x == y
            else:
                ok = x == y
            assert ok, f"{name}: col {c} row {i}: {x!r} != {y!r}"


QUERIES = E.queries()
ORACLES = E.oracle_sql()


def test_never_oracled_in_window():
    """Rotation guard (round-4 verdict, repeated finding): the external
    driver oracles only the FIRST 50 queries() entries, so every entry
    that has never appeared in a CORRECTNESS_r0*.json must sit inside
    that window — otherwise it ships another round unchecked. Late-round
    gate adds must displace already-oracled entries, not queue behind
    them."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            seen |= set(json.load(open(p)).keys())
        except Exception:
            pass
    if not seen:
        pytest.skip("no driver correctness records yet")
    pinned = {"bm25_topk_or", "bm25_indexed_topk"}  # continuity core
    order = list(QUERIES)
    window = order[:50]
    never = [k for k in order if k not in seen]
    outside = [k for k in never if k not in set(window)]
    if outside:
        # a backlog larger than the window is allowed — but then no
        # window slot may be wasted on an already-oracled entry
        wasted = [k for k in window if k in seen and k not in pinned]
        assert not wasted, (
            f"{len(outside)} never-oracled entries queue outside the "
            f"first-50 window while {len(wasted)} window slots are spent "
            f"on already-oracled entries — swap them: waiting={outside} "
            f"wasted={wasted}"
        )


def test_oracle_coverage():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle_sql for unknown queries: {missing}"
    # the intentionally oracle-less entries (approximate operators)
    no_oracle = set(QUERIES) - set(ORACLES)
    assert no_oracle <= {
        "ann_cosine_lsh", "hll_users_by_type", "textlogit_confusion",
        "ltr_rescore_top10", "textlogit_stored",
        # round 5: seeded k-means page clustering has no SQL twin
        "cluster_search_page",
        # round 5: driver-side Bayesian lattice scoring (stats pass is
        # oracled as phrase_stats_query; model tested in test_phrases)
        "phrases_identify",
    }, no_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(ORACLES[name]).fetchdf()
    _compare(name, sdf, ddf)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_entries(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0 and len(df.columns) >= 1


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"docid", "score"} <= set(df.columns)
