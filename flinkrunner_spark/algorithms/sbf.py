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

    def _probes(self, item: str) -> np.ndarray:
        digest = hashlib.md5(item.encode("utf-8")).digest()
        h1 = int.from_bytes(digest[:8], "big", signed=False)
        h2 = int.from_bytes(digest[8:], "big", signed=False)
        return np.array(
            [(h1 + i * h2) % self.m for i in range(1, self.K + 1)], dtype=np.int64
        )

    def add(self, item: str) -> bool:
        """Insert; returns True if the item was (probably) seen before."""
        probes = self._probes(item)
        maybe_seen = bool((self.cells[probes] > 0).all())
        self._decrement_random()
        self.cells[probes] = self.max
        return maybe_seen

    def might_contain(self, item: str) -> bool:
        return bool((self.cells[self._probes(item)] > 0).all())

    def _decrement_random(self) -> None:
        # As in the paper: one random start, decrement P consecutive cells.
        start = int(self._rng.integers(0, self.m))
        idx = (np.arange(self.P) + start) % self.m
        nz = self.cells[idx] > 0
        self.cells[idx[nz]] -= 1

    def merge(self, other: "StableBloomFilter") -> "StableBloomFilter":
        if (other.m, other.d) != (self.m, self.d):
            raise ValueError("can only merge SBFs with identical geometry")
        np.maximum(self.cells, other.cells, out=self.cells)
        return self
