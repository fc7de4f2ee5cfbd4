"""HyperLogLog cardinality estimator.

Parity target: reference algorithm/cardinality/HyperLogLog.scala (Flajolet
et al. 2007 with the classic small/large-range corrections; ALPHA_M =
1/(2 ln 2), registers m = 2^b, b ∈ [4,16], merge = elementwise register
max). Hashing here is md5-based (stable across processes/languages), and
register extraction uses the standard j = x & (m-1) / rho(upper bits)
split.

Distributed shape (100 TB-ready): per-partition partial register arrays
(mapInPandas, no shuffle), then a single small shuffle of (key, m-byte
register array) rows merged per key with elementwise max — the same
partial/merge contract as the reference's merge() method, and the same
pattern Spark's own approx_count_distinct (HLL++) uses internally.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

ALPHA_M = 1.0 / (2.0 * math.log(2.0))  # HyperLogLog.scala:133
TWO32 = float(2**32)


def _hash32(s: str) -> int:
    h = int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:4], "big")
    return h & 0x7FFFFFFF  # non-negative, as the reference flips negatives


def update_registers(M: np.ndarray, values, b: int) -> None:
    """Batched register update: one md5 per *unique* value (max-merge is
    idempotent, so duplicates are dropped up front), then vectorized
    index/rho extraction and a single ``np.maximum.at`` scatter. The only
    per-item work left is the md5 digest itself — bit ops, rho, and the
    register max never touch the Python interpreter per row."""
    m = 1 << b
    width = 31 - b
    uniq = {str(v) for v in values}
    if not uniq:
        return
    digests = b"".join(
        hashlib.md5(v.encode("utf-8")).digest()[:4] for v in uniq
    )
    x = np.frombuffer(digests, dtype=">u4").astype(np.int64) & 0x7FFFFFFF
    j = x & (m - 1)
    w = x >> b
    # bit_length(w) == floor(log2(w)) + 1 for w > 0; float64 log2 is exact
    # enough for 31-bit ints (nearest power-of-2 gap ≥ 4e-10 ≫ ulp).
    bl = np.zeros(len(x), dtype=np.int64)
    nz = w > 0
    bl[nz] = np.floor(np.log2(w[nz])).astype(np.int64) + 1
    rho = (width - bl + 1).astype(M.dtype)
    np.maximum.at(M, j, rho)


def estimate(M: np.ndarray) -> int:
    """Flajolet estimator with small/large-range corrections
    (HyperLogLog.scala:70-86)."""
    m = len(M)
    E = ALPHA_M * m * m / np.power(2.0, -M.astype(np.float64)).sum()
    small_range = (5 // 2) * m  # integer division, as the reference
    if E <= small_range:
        V = int((M == 0).sum())
        if V != 0:
            return int(m * math.log(m / V))
        return int(E)
    if E <= math.floor(TWO32 / 30):
        return int(E)
    return int(-TWO32 * math.log(1.0 - E / TWO32))


def hll_cardinality_by_key(df, key: str, value: str, b: int = 12):
    """Distributed HLL distinct-count of ``value`` per ``key``."""
    from pyspark.sql import functions as F

    m = 1 << b

    def partial(iterator):
        import pandas as pd

        acc: dict = {}
        for pdf in iterator:
            for k, grp in pdf.groupby(key, sort=False):
                M = acc.setdefault(k, np.zeros(m, dtype=np.int8))
                update_registers(M, grp[value].tolist(), b)
        for k, M in acc.items():
            yield pd.DataFrame({key: [k], "regs": [M.tolist()]})

    def merge(pdf):
        import pandas as pd

        M = np.maximum.reduce(
            [np.asarray(r, dtype=np.int8) for r in pdf["regs"]]
        )
        return pd.DataFrame(
            {key: [pdf[key].iloc[0]], "n_users_hll": [estimate(M)]}
        )

    key_type = dict(df.dtypes)[key]
    partials = df.select(key, value).mapInPandas(
        partial, schema=f"{key} {key_type}, regs array<tinyint>"
    )
    return partials.groupBy(key).applyInPandas(
        merge, schema=f"{key} {key_type}, n_users_hll long"
    )
