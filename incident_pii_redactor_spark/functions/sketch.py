"""Mergeable quantile sketch (KLL, Karnin-Lang-Liberty 2016) for
distributed percentiles without a global sort.

Completes the engine's sketch family (KMV distinct, HLL++, MinHash,
SimHash, Bloom): ``events_value_quantiles`` already computes exact
quantiles via bounded histograms when the value DOMAIN is known; KLL is
the domain-free companion — O(k log n) space, any ordered values,
mergeable, so per-partition sketches combine into one corpus sketch
with rank error ~O(1/k) regardless of data size or skew.

Determinism: classic KLL flips a fair coin per compaction (keep odd or
even positions). This implementation derives the coin from
``md5(level, items_compacted_so_far)`` — a deterministic, input-order-
dependent but SEED-FREE choice, so the same partition contents always
produce the same sketch (retries and re-runs are reproducible; the
error guarantee holds with the hash standing in for the coin, the
standard derandomization used by production sketch libraries).

Scale shape: one ``mapInPandas`` pass builds a sketch per PARTITION
(numpy batch inserts), the ≤ num_partitions serialized sketches
(couple of KB each) collect to the driver and merge — the same
bounded two-level pattern as the KMV sketch. No shuffle at all."""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd


class KLL:
    """KLL sketch over float64 values. ``k`` bounds level capacity
    (rank error ≈ 1.7/k at 99% for the classic analysis)."""

    __slots__ = ("k", "levels", "n", "c")

    def __init__(self, k: int = 200):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self.c = 0  # compactions performed (varies the hash-coin)

    # -- building -----------------------------------------------------
    def _capacity(self, level: int) -> int:
        # geometric decay c^h with c = 2/3, floored at 2
        c = (2.0 / 3.0) ** (len(self.levels) - 1 - level)
        return max(2, int(np.ceil(self.k * c)))

    def insert_batch(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.n += int(v.size)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def _coin(self, level: int) -> int:
        # keyed on the COMPACTION counter, not items inserted (review
        # round 5): within one insert_batch/_compress cascade n is
        # fixed, so an n-keyed coin reused the same parity for every
        # compaction of a level, systematically dropping the same
        # positions and biasing the rank error in one direction
        h = hashlib.md5(f"{level}|{self.c}".encode()).digest()
        return h[0] & 1

    def _compress(self) -> None:
        while True:
            total = sum(a.size for a in self.levels)
            cap = sum(self._capacity(i) for i in range(len(self.levels)))
            if total <= cap:
                return
            # compact the lowest level over its capacity
            for i, arr in enumerate(self.levels):
                if arr.size > self._capacity(i):
                    arr = np.sort(arr, kind="stable")
                    off = self._coin(i)
                    self.c += 1
                    kept = arr[off::2]
                    dropped = arr[1 - off::2]
                    self.levels[i] = dropped[:0]  # emptied
                    if i + 1 == len(self.levels):
                        self.levels.append(np.empty(0, dtype=np.float64))
                    self.levels[i + 1] = np.concatenate(
                        [self.levels[i + 1], kept])
                    break
            else:
                return

    # -- merging ------------------------------------------------------
    def merge(self, other: "KLL") -> "KLL":
        out = KLL(min(self.k, other.k))
        out.n = self.n + other.n
        out.c = self.c + other.c
        depth = max(len(self.levels), len(other.levels))
        out.levels = []
        for i in range(depth):
            a = self.levels[i] if i < len(self.levels) else \
                np.empty(0, dtype=np.float64)
            b = other.levels[i] if i < len(other.levels) else \
                np.empty(0, dtype=np.float64)
            out.levels.append(np.concatenate([a, b]))
        out._compress()
        return out

    # -- querying -----------------------------------------------------
    def _weighted(self):
        vals = []
        wts = []
        for i, arr in enumerate(self.levels):
            if arr.size:
                vals.append(arr)
                wts.append(np.full(arr.size, 1 << i, dtype=np.int64))
        if not vals:
            return (np.empty(0, dtype=np.float64),
                    np.empty(0, dtype=np.int64))
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._weighted()
        if v.size == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(idx, v.size - 1)])

    def rank(self, x: float) -> float:
        """Estimated fraction of items <= x."""
        v, w = self._weighted()
        if v.size == 0:
            return float("nan")
        idx = int(np.searchsorted(v, x, side="right"))
        total = int(w.sum())
        return float(w[:idx].sum()) / total

    # -- serialization (driver collect) --------------------------------
    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps(
            {"k": self.k, "n": self.n, "c": self.c,
             "levels": [a.tolist() for a in self.levels]})

    @staticmethod
    def from_bytes(b: bytes) -> "KLL":
        import pickle

        d = pickle.loads(b)
        s = KLL(d["k"])
        s.n = d["n"]
        s.c = d.get("c", 0)
        s.levels = [np.asarray(a, dtype=np.float64) for a in d["levels"]]
        return s


def kll_sketch(df, value_col: str, k: int = 200) -> KLL:
    """Distributed KLL build: one narrow ``mapInPandas`` pass emits one
    serialized sketch per partition (a few KB), the driver merges the
    ≤ num_partitions results. No shuffle, no sort, no domain knowledge
    — the companion to ``events_value_quantiles``'s exact
    known-domain histogram."""
    pruned = df.select(value_col)

    def build(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        s = KLL(k)
        for pdf in batches:
            s.insert_batch(pdf[value_col].to_numpy(dtype=np.float64,
                                                   na_value=np.nan))
        if s.n:
            yield pd.DataFrame({"sketch": [s.to_bytes()]})

    parts = pruned.mapInPandas(build, "sketch binary").collect()
    out = KLL(k)
    for row in parts:
        out = out.merge(KLL.from_bytes(bytes(row["sketch"])))
    return out
