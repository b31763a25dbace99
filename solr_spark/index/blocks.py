"""Posting-list block codec: delta + LEB128 varint, 128-doc blocks.

Replaces the reference's Lucene postings codec role (per-field codec
selection at solr/core/src/java/org/apache/solr/core/SchemaCodecFactory.java:99-111;
block postings with skip data are public Lucene behavior) with a
columnar layout: each 128-doc block of a (term, salt) posting list is one
parquet row carrying delta+varint docids, varint tfs, and block-max
metadata (`max_tf`, `max_tf_part`) for block-max WAND pruning.

Everything here is NumPy-vectorized (no per-value Python in either
direction); the encoder runs inside `mapInPandas` over partition-sorted
postings, the decoder inside the query path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from solr_spark.functions.bm25 import B, K1

BLOCK_SIZE = 128

BLOCKS_SCHEMA = (
    "tid long, salt int, block_id int, n_docs int, first_docid long, "
    "max_docid long, max_tf int, max_tf_part double, min_tf_part double, "
    "docids_bin binary, tfs_bin binary, dlqs_bin binary, bucket int"
)


def varint_encode(vals: np.ndarray) -> bytes:
    """Vectorized unsigned LEB128 encode of a non-negative int64 array."""
    v = np.asarray(vals, dtype=np.uint64)
    if v.size == 0:
        return b""
    nb = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += tmp > 0
        tmp >>= np.uint64(7)
    ends = np.cumsum(nb)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    starts = ends - nb
    rem = v.copy()
    active = np.arange(v.size)
    k = 0
    while active.size:
        byte = (rem[active] & np.uint64(0x7F)).astype(np.uint8)
        more = (k + 1) < nb[active]
        out[starts[active] + k] = byte | (more.astype(np.uint8) << 7)
        rem[active] >>= np.uint64(7)
        active = active[more]
        k += 1
    return out.tobytes()


def varint_decode(buf: bytes, n: int) -> np.ndarray:
    """Vectorized LEB128 decode of exactly n values."""
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    idx = np.zeros(b.size, dtype=np.int64)
    idx[1:] = np.cumsum(is_last)[:-1]
    starts = np.zeros(n, dtype=np.int64)
    last_pos = np.nonzero(is_last)[0]
    starts[1:] = last_pos[:-1] + 1
    shifts = ((np.arange(b.size) - starts[idx]) * 7).astype(np.uint64)
    vals = np.zeros(n, dtype=np.uint64)
    np.add.at(vals, idx, (b & np.uint64(0x7F)).astype(np.uint64) << shifts)
    return vals.astype(np.int64)


def encode_posting_list(
    tid: int,
    salt: int,
    bucket: int,
    docids: np.ndarray,
    tfs: np.ndarray,
    dlqs: np.ndarray,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> list[dict]:
    """Encode one (tid, salt) posting list (docid-sorted) into block rows."""
    rows = []
    for blk, lo in enumerate(range(0, len(docids), block_size)):
        d = docids[lo : lo + block_size]
        t = tfs[lo : lo + block_size]
        q = dlqs[lo : lo + block_size]
        tf_part = t / (t + K1 * (1.0 - B + B * q / avgdl))
        deltas = np.diff(d, prepend=d[0])  # first delta 0; first_docid in column
        rows.append(
            {
                "tid": int(tid),
                "salt": int(salt),
                "block_id": blk,
                "n_docs": int(len(d)),
                "first_docid": int(d[0]),
                "max_docid": int(d[-1]),
                "max_tf": int(t.max()),
                "max_tf_part": float(tf_part.max()),
                # block-min bound: every posting in this block contributes
                # >= w*min_tf_part — a SOUND kth-score seed can be read off
                # block metadata alone (no decode pass; see wand.py)
                "min_tf_part": float(tf_part.min()),
                "docids_bin": varint_encode(deltas),
                "tfs_bin": varint_encode(t),
                # per-posting quantized doc length: scoring a decoded block
                # needs NO join back to the docs table (postings are
                # self-contained, like Lucene norms riding with the index)
                "dlqs_bin": varint_encode(q.astype(np.int64)),
                "bucket": int(bucket),
            }
        )
    return rows


def decode_block(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block row back to (docids, tfs, dlqs)."""
    n = int(row["n_docs"])
    deltas = varint_decode(row["docids_bin"], n)
    deltas[0] = row["first_docid"]
    return (
        np.cumsum(deltas),
        varint_decode(row["tfs_bin"], n),
        varint_decode(row["dlqs_bin"], n),
    )


def make_block_encoder(avgdl, block_size: int = BLOCK_SIZE):
    """Returns a mapInPandas function that streams partition-sorted
    postings (tid, salt, docid, tf, dl_q, bucket; sorted by tid, salt,
    docid within the partition) into block rows.

    `avgdl` is a float on single-field indexes. On MULTI-FIELD indexes
    pass a sequence indexed by field ordinal and include a `fid` column
    in the input: tf_part (and hence the block-max metadata) must use
    the posting's FIELD's average length (per-field norms — the Lucene
    per-field similarity). A tid belongs to exactly one (field, term),
    so fid is constant within every (tid, salt) group.

    Carries the trailing incomplete (tid, salt) group across Arrow batch
    boundaries; group keys never span partitions because the input is
    repartitioned on (tid, salt).
    """
    avgdl_arr = None if isinstance(avgdl, float) else np.asarray(avgdl, dtype=np.float64)

    def encode_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None

        def emit(pdf: pd.DataFrame) -> pd.DataFrame:
            out: list[dict] = []
            tids = pdf["tid"].to_numpy(dtype=np.int64)
            salts = pdf["salt"].to_numpy()
            # group boundaries on (tid, salt)
            change = np.nonzero((tids[1:] != tids[:-1]) | (salts[1:] != salts[:-1]))[0] + 1
            bounds = np.concatenate(([0], change, [len(pdf)]))
            docids = pdf["docid"].to_numpy(dtype=np.int64)
            tfs = pdf["tf"].to_numpy(dtype=np.int64)
            dlqs = pdf["dl_q"].to_numpy(dtype=np.float64)
            buckets = pdf["bucket"].to_numpy()
            fids = (
                pdf["fid"].to_numpy(dtype=np.int64)
                if avgdl_arr is not None
                else None
            )
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                adl = (
                    float(avgdl_arr[fids[lo]])
                    if avgdl_arr is not None
                    else avgdl
                )
                out.extend(
                    encode_posting_list(
                        int(tids[lo]), int(salts[lo]), int(buckets[lo]),
                        docids[lo:hi], tfs[lo:hi], dlqs[lo:hi], adl,
                        block_size,
                    )
                )
            cols = ["tid", "salt", "block_id", "n_docs", "first_docid",
                    "max_docid", "max_tf", "max_tf_part", "min_tf_part",
                    "docids_bin", "tfs_bin", "dlqs_bin", "bucket"]
            return pd.DataFrame(out, columns=cols)

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            # hold back the last (tid, salt) group — it may continue
            last_tid = pdf["tid"].iloc[-1]
            last_salt = pdf["salt"].iloc[-1]
            tail_mask = (pdf["tid"] == last_tid) & (pdf["salt"] == last_salt)
            # tail is a contiguous suffix (input sorted); find its start
            cut = int(len(pdf) - tail_mask.iloc[::-1].cumprod().sum())
            carry = pdf.iloc[cut:].reset_index(drop=True)
            if cut > 0:
                yield emit(pdf.iloc[:cut])
        if carry is not None and len(carry):
            yield emit(carry)

    return encode_stream
