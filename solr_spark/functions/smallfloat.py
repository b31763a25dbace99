"""Lucene SmallFloat 4-bit-mantissa length quantization.

Lucene stores each document's field length (`dl`) as one byte using a
lossy 4-bit-mantissa encoding (public, documented behavior of
`org.apache.lucene.util.SmallFloat.intToByte4/byte4ToInt`; the Solr
reference consumes it via BM25 norms — see
solr/core/src/java/org/apache/solr/search/similarities/BM25SimilarityFactory.java
and the OMIT_NORMS flag at
solr/core/src/java/org/apache/solr/schema/FieldProperties.java:37).
BM25 scores are computed from the DECODED quantized length, so exact
score parity requires reproducing this table.

Properties (unit-tested): values 0..23 are exact; encode is monotone
non-decreasing; decode(encode(x)) <= x; the 256-entry decode table is
strictly increasing — therefore encode(x) == the largest table entry <= x,
which is how the Spark and DuckDB forms compute it without bit ops.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def _long_to_int4(i: int) -> int:
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    return encoded | ((shift + 1) << 3)


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - _MAX_INT4  # 24


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int into the 0..255 quantization bucket."""
    if i < 0:
        raise ValueError("negative length")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + _long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode bucket 0..255 back to the quantized length."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + _int4_to_long(b - NUM_FREE_VALUES)


#: strictly-increasing 256-entry decode table
DECODE_TABLE: list[int] = [byte4_to_int(b) for b in range(256)]
_DECODE_NP = np.array(DECODE_TABLE, dtype=np.int64)


def quantize_np(lengths: np.ndarray) -> np.ndarray:
    """Vectorized encode-then-decode: length -> quantized length."""
    idx = np.searchsorted(_DECODE_NP, lengths, side="right") - 1
    return _DECODE_NP[idx]


def quantize_col(col: Column | str) -> Column:
    """Spark Column: length -> decoded quantized length (JVM-side).

    Arithmetic form (no per-row allocation): for y = x - 24 >= 8,
    decode(encode(y)) truncates y to its top 4 bits:
        s = bit_length(y) - 4;  q = 24 + ((y >> s) << s)
    bit_length is a when-chain of integer comparisons (exact — float
    log2 would misround at power-of-two boundaries). Values below 24
    (and subnormal y < 8) are exact. Equivalence with the table is
    unit-tested over the full small range + random large values.
    """
    c = (F.col(col) if isinstance(col, str) else col).cast("long")
    y = c - F.lit(NUM_FREE_VALUES)
    # p = 2^s with s = max(bit_length(y) - 4, 0); truncating the low s
    # bits is y - y % p (integer ops only, no per-row allocation)
    p = F.lit(1).cast("long")
    for k in range(1, 28):  # doclen < 2^31
        p = F.when(y >= F.lit(1 << (k + 3)), F.lit(1 << k).cast("long")).otherwise(p)
    quant = F.lit(NUM_FREE_VALUES) + (y - F.pmod(y, p))
    return F.when(c < NUM_FREE_VALUES + 8, c).otherwise(quant)


def quantize_sql(col_expr: str) -> str:
    """DuckDB SQL expression: length -> decoded quantized length."""
    lut = ",".join(str(v) for v in DECODE_TABLE)
    # NB: lambda var must not collide with identifiers in col_expr
    return f"list_max(list_filter([{lut}], _sfv -> _sfv <= {col_expr}))"
