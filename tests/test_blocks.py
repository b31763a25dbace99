"""Varint/delta block codec round-trip properties (seeded random)."""

import numpy as np

from solr_spark.index.blocks import (
    decode_block,
    encode_posting_list,
    make_block_encoder,
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


def _stream_rows(enc, tbl, batch_rows):
    """Drive the mapInArrow encoder with record batches of batch_rows."""
    import pyarrow as pa

    batches = pa.Table.from_pydict(tbl).to_batches(max_chunksize=batch_rows)
    out = []
    for rb in enc(iter(batches)):
        out.extend(rb.to_pylist())
    return out


def _reference_rows(tbl, avgdl, multi=False):
    """Per-group encode_posting_list over the same sorted input."""
    tids = np.asarray(tbl["tid"])
    salts = np.asarray(tbl["salt"])
    keys = list(zip(tids.tolist(), salts.tolist()))
    rows = []
    lo = 0
    for i in range(1, len(keys) + 1):
        if i == len(keys) or keys[i] != keys[lo]:
            adl = avgdl[tbl["fid"][lo]] if multi else avgdl
            rows.extend(
                encode_posting_list(
                    int(tids[lo]), int(salts[lo]), int(tbl["bucket"][lo]),
                    np.asarray(tbl["docid"][lo:i]),
                    np.asarray(tbl["tf"][lo:i]),
                    np.asarray(tbl["dl_q"][lo:i], dtype=np.float64),
                    float(adl),
                )
            )
            lo = i
    return rows


def test_stream_encoder_matches_per_group_encode():
    """The vectorized whole-batch encoder must be value- and
    byte-identical to per-group encode_posting_list, including across
    Arrow batch boundaries that split a (tid, salt) group."""
    rng = np.random.default_rng(11)
    tbl = {k: [] for k in ("tid", "salt", "docid", "tf", "dl_q", "bucket")}
    for g in range(40):
        n = int(rng.integers(1, 400))
        tid = int(rng.integers(-(2**62), 2**62))
        salt = int(rng.integers(0, 4))
        docids = np.sort(rng.choice(10**7, size=n, replace=False))
        tbl["tid"].extend([tid] * n)
        tbl["salt"].extend([salt] * n)
        tbl["docid"].extend(docids.tolist())
        tbl["tf"].extend(rng.integers(1, 30, size=n).tolist())
        tbl["dl_q"].extend(rng.integers(20, 500, size=n).tolist())
        tbl["bucket"].extend([tid % 16] * n)
    want = _reference_rows(tbl, avgdl=137.25)
    for batch_rows in (57, 1000, len(tbl["tid"])):
        got = _stream_rows(make_block_encoder(137.25), tbl, batch_rows)
        assert got == want, f"mismatch at batch_rows={batch_rows}"


def test_stream_encoder_derives_head_salt():
    """salt_threshold mode: the encoder must salt head tid-runs itself
    and emit EXACTLY the blocks the pre-salted, pre-sorted input form
    produces — including when a head group spans Arrow batches."""
    rng = np.random.default_rng(3)
    thr, nsalt = 200, 8
    unsorted = {k: [] for k in ("tid", "salt", "docid", "tf", "dl_q", "bucket")}
    presorted = {k: [] for k in unsorted}
    for g in range(25):
        head = g in (3, 11, 19)
        n = int(rng.integers(thr + 1, 1500)) if head else int(rng.integers(1, thr))
        tid = int(rng.integers(-(2**62), 2**62))
        docids = np.sort(rng.choice(10**6, size=n, replace=False))
        tf = rng.integers(1, 20, size=n)
        dlq = rng.integers(20, 400, size=n)
        salt = (docids % nsalt).astype(np.int64) if head else np.zeros(n, dtype=np.int64)
        unsorted["tid"].extend([tid] * n)
        unsorted["salt"].extend([0] * n)  # ignored in derive mode
        unsorted["docid"].extend(docids.tolist())
        unsorted["tf"].extend(tf.tolist())
        unsorted["dl_q"].extend(dlq.tolist())
        unsorted["bucket"].extend([tid % 16] * n)
        order = np.lexsort((docids, salt))
        presorted["tid"].extend([tid] * n)
        presorted["salt"].extend(salt[order].tolist())
        presorted["docid"].extend(docids[order].tolist())
        presorted["tf"].extend(tf[order].tolist())
        presorted["dl_q"].extend(dlq[order].tolist())
        presorted["bucket"].extend([tid % 16] * n)
    want = _reference_rows(presorted, avgdl=119.5)
    derive_in = {k: v for k, v in unsorted.items() if k != "salt"}
    for batch_rows in (57, 1024, len(unsorted["tid"])):
        got = _stream_rows(
            make_block_encoder(119.5, salt_threshold=thr, num_salts=nsalt),
            derive_in, batch_rows,
        )
        assert got == want, f"mismatch at batch_rows={batch_rows}"


def test_stream_encoder_multi_field_avgdl():
    rng = np.random.default_rng(5)
    tbl = {k: [] for k in ("tid", "salt", "docid", "tf", "dl_q", "bucket", "fid")}
    for g in range(10):
        n = int(rng.integers(1, 300))
        fid = int(rng.integers(0, 3))
        tbl["tid"].extend([g * 7919] * n)
        tbl["salt"].extend([0] * n)
        tbl["docid"].extend(np.sort(rng.choice(10**6, size=n, replace=False)).tolist())
        tbl["tf"].extend(rng.integers(1, 9, size=n).tolist())
        tbl["dl_q"].extend(rng.integers(10, 200, size=n).tolist())
        tbl["bucket"].extend([g % 16] * n)
        tbl["fid"].extend([fid] * n)
    avgdl = [80.0, 133.5, 212.25]
    want = _reference_rows(tbl, avgdl, multi=True)
    got = _stream_rows(make_block_encoder(avgdl), tbl, 97)
    assert got == want
