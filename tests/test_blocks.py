"""Varint/delta block codec round-trip properties (seeded random)."""

import numpy as np

from solr_spark.index.blocks import (
    decode_block,
    encode_posting_list,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip():
    rng = np.random.default_rng(42)
    for _ in range(50):
        n = int(rng.integers(0, 500))
        vals = rng.integers(0, 2**40, size=n)
        buf = varint_encode(vals)
        out = varint_decode(buf, n)
        assert (out == vals).all()


def test_varint_small_values_one_byte():
    vals = np.arange(0, 128)
    assert len(varint_encode(vals)) == 128


def test_block_roundtrip_and_bounds():
    rng = np.random.default_rng(7)
    docids = np.sort(rng.choice(10**6, size=1000, replace=False))
    tfs = rng.integers(1, 50, size=1000)
    dlqs = rng.integers(20, 500, size=1000).astype(np.float64)
    rows = encode_posting_list(-7455637536468433862, 0, 3, docids, tfs, dlqs, avgdl=120.0)
    assert len(rows) == 8  # 1000 / 128 -> 8 blocks
    got_d, got_t, got_q = [], [], []
    for r in rows:
        d, t, q = decode_block(r)
        assert r["first_docid"] == d[0] and r["max_docid"] == d[-1]
        assert r["max_tf"] == t.max()
        assert 0.0 < r["max_tf_part"] <= 1.0
        got_d.append(d)
        got_t.append(t)
        got_q.append(q)
    assert (np.concatenate(got_d) == docids).all()
    assert (np.concatenate(got_t) == tfs).all()
    assert (np.concatenate(got_q) == dlqs.astype(np.int64)).all()
