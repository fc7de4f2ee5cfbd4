"""Stable Bloom Filter (Deng & Rafiei, SIGMOD 2006) for approximate
duplicate detection on unbounded streams.

Parity target: reference algorithm/membership/StableBloomFilter.scala —
m d-bit cells, K = max(1, ceil(Max·ln²2)) hash probes, P cells decremented
per insertion (paper eqn 17), insert sets probed cells to Max = 2^d-1,
membership = all probed cells non-zero, merge = elementwise max/OR.

This implementation stores one cell per numpy uint8 (d ≤ 8) rather than
packing 63-bit words — simpler, vectorizes the decrement, and the
semantics (the paper's) are identical. Hashing is md5 double-hashing
(h1 + i·h2 mod m), deterministic across processes; the decrement RNG is
seeded so distributed runs are reproducible.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


def optimal_p(m: int, K: int, d: int, fpr: float) -> int:
    """Eqn 17 of the paper (StableBloomFilter.scala:240)."""
    Max = (1 << d) - 1
    denom1 = 1.0 / (1.0 - fpr ** (1.0 / K)) ** (1.0 / Max) - 1.0
    denom2 = 1.0 / K - 1.0 / m
    p = int(1.0 / (denom1 * denom2))
    return p if p > 0 else 1


class StableBloomFilter:
    def __init__(self, m: int, d: int, fpr: float, seed: int = 42):
        if not (1 <= d <= 8):
            raise ValueError("d must be in [1,8] for byte-cell storage")
        if not (0.0 < fpr < 1.0):
            raise ValueError("FPR must be in (0,1)")
        self.m = int(m)
        self.d = int(d)
        self.fpr = float(fpr)
        self.max = (1 << d) - 1
        ln2 = math.log(2.0)
        self.K = max(1, math.ceil(self.max * ln2 * ln2))
        self.P = optimal_p(self.m, self.K, self.d, self.fpr)
        self.cells = np.zeros(self.m, dtype=np.uint8)
        self._rng = np.random.default_rng(seed)

    def _probe_matrix(self, items: "list[str]") -> np.ndarray:
        """(n, K) probe indices via md5 double-hashing. Arithmetic is uint64
        (wraps mod 2^64 before mod m) so the whole matrix vectorizes."""
        digests = b"".join(
            hashlib.md5(s.encode("utf-8")).digest() for s in items
        )
        h = np.frombuffer(digests, dtype=">u8").reshape(len(items), 2)
        i = np.arange(1, self.K + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return ((h[:, :1] + i[None, :] * h[:, 1:]) % np.uint64(self.m)).astype(
                np.int64
            )

    def _probes(self, item: str) -> np.ndarray:
        return self._probe_matrix([item])[0]

    def add(self, item: str) -> bool:
        """Insert; returns True if the item was (probably) seen before."""
        return bool(self.add_batch([item])[0])

    def add_batch(self, items: "list[str]") -> np.ndarray:
        """Insert a batch sequentially (same semantics as repeated ``add``);
        returns a bool array — True where the item was (probably) seen.

        Hashing and RNG draws are batch-vectorized; the per-row part is the
        unavoidable sequential cell update (each insert observes the cells
        as left by the previous one), done with slice views, not fancy
        indexing — ~3× the throughput of scalar ``add`` in a loop.
        """
        n = len(items)
        if n == 0:
            return np.zeros(0, dtype=bool)
        probes = self._probe_matrix(items)
        starts = self._rng.integers(0, self.m, size=n)
        seen = np.empty(n, dtype=bool)
        cells, m, P, Max = self.cells, self.m, self.P, self.max
        for j in range(n):
            p = probes[j]
            seen[j] = bool(cells[p].all())
            # decrement P consecutive cells from a random start (paper) —
            # contiguous, so slice views instead of index arrays
            s = int(starts[j])
            e = s + P
            if e <= m:
                v = cells[s:e]
                v[v > 0] -= 1
            else:
                v = cells[s:]
                v[v > 0] -= 1
                v = cells[: e - m]
                v[v > 0] -= 1
            cells[p] = Max
        return seen

    def might_contain(self, item: str) -> bool:
        return bool((self.cells[self._probes(item)] > 0).all())

    def merge(self, other: "StableBloomFilter") -> "StableBloomFilter":
        if (other.m, other.d) != (self.m, self.d):
            raise ValueError("can only merge SBFs with identical geometry")
        np.maximum(self.cells, other.cells, out=self.cells)
        return self
