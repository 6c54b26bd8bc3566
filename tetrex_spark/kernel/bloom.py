"""Bloom filter kernel — the core sketch, modeled on the reference's IBF.

Reference parity:
  - sizing rule m = ceil(-n * ln p / ln^2 2), sized to the expected bin
    cardinality: /root/reference/include/index_ibf.h:133-139
    (find_largest_bin + compute_bitcount) and index_base.h:72-77.
  - h independent hash functions (default 3, fpr default 0.05):
    /root/reference/include/arg_parse.h:14,19.
  - bulk insert of buffered keys: /root/reference/include/index_ibf.h:88-99.

Differences (Spark-first, documented in SURVEY.md §1.3): we do not
bit-interleave B filters into one matrix on disk — each bin's filter is an
independent row of the sketch table, and the "interleaving" is recreated
driver-side by stacking collected payloads into a (B, m) bit matrix so one
probe still yields a length-B vector (see plans/traverse.py).

Merge = bitwise OR → byte-identical payloads under any merge order/shape.
"""

from __future__ import annotations

import math

import numpy as np

from .base import Sketch
from .hashing import bloom_positions


def bloom_m_bits(n_items: int, fpr: float) -> int:
    """m = ceil(-n ln p / ln^2 2), rounded up to a multiple of 64.

    Port of compute_bitcount (/root/reference/include/index_ibf.h:81-86).
    """
    if n_items <= 0:
        return 64
    m = math.ceil(-n_items * math.log(fpr) / (math.log(2) ** 2))
    return ((m + 63) // 64) * 64


class BloomFilter(Sketch):
    KIND = "bloom"

    def __init__(self, m_bits: int, n_hashes: int = 3, *, bits: np.ndarray | None = None):
        if m_bits % 8:
            raise ValueError("m_bits must be a multiple of 8")
        self.m_bits = int(m_bits)
        self.n_hashes = int(n_hashes)
        self.bits = bits if bits is not None else np.zeros(m_bits // 8, dtype=np.uint8)
        self.n_items = 0  # approximate (pre-dedup) insert count, for metrics

    @classmethod
    def sized(cls, n_items: int, fpr: float = 0.05, n_hashes: int = 3) -> "BloomFilter":
        return cls(bloom_m_bits(n_items, fpr), n_hashes)

    def params(self) -> dict:
        return {"m_bits": self.m_bits, "n_hashes": self.n_hashes}

    def update(self, keys: np.ndarray) -> "BloomFilter":
        if len(keys) == 0:
            return self
        pos = bloom_positions(keys, self.m_bits, self.n_hashes).ravel()
        if pos.size * 8 > self.m_bits:
            # dense path: scatter into a bool buffer (duplicate-safe fancy
            # assignment, ~20x faster than unbuffered bitwise_or.at), then
            # pack and OR — wins once inserts rival the filter size
            buf = np.zeros(self.m_bits, dtype=bool)
            buf[pos] = True
            np.bitwise_or(self.bits, np.packbits(buf, bitorder="little"), out=self.bits)
        else:
            np.bitwise_or.at(
                self.bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
            )
        self.n_items += len(keys)
        return self

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership probe for a batch of keys."""
        keys = np.atleast_1d(np.asarray(keys, dtype=np.uint64))
        pos = bloom_positions(keys, self.m_bits, self.n_hashes)
        got = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return got.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self._check_mergeable(other)
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_items += other.n_items
        return self

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits).mean())

    def estimate(self) -> float:
        """Estimated distinct inserts from fill ratio: -m/h * ln(1 - f)."""
        f = self.fill_ratio()
        if f >= 1.0:
            return float("inf")
        return -self.m_bits / self.n_hashes * math.log(1.0 - f)

    def _body(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def _from_body(cls, params: dict, body: bytes) -> "BloomFilter":
        bits = np.frombuffer(body, dtype=np.uint8).copy()
        return cls(params["m_bits"], params["n_hashes"], bits=bits)
