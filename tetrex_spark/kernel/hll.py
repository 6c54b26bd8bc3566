"""HyperLogLog kernel (dense registers) — approximate distinct counting.

Required by the north rule (BASELINE.json): distinct-shingle counts with
the published bound sigma = 1.04 / sqrt(m). The reference has no distinct
counter (its IBF answers membership only); this fills the gap with the
same mergeable-lattice shape as the Bloom kernel: register-wise MAX merge
→ byte-identical payloads under any merge order.

Algorithm: Flajolet et al. 2007 HyperLogLog with the standard small-range
(linear counting) correction; 64-bit hashes make the large-range
correction unnecessary below ~2^57 distinct.
"""

from __future__ import annotations

import numpy as np

from .base import Sketch

U64 = np.uint64


# clz per byte value (8 for zero)
_CLZ8 = np.array([8 - int(v).bit_length() for v in range(256)], dtype=np.int64)


def _clz64(v: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros for uint64 (64 for v == 0).

    Assumes little-endian host (x86/arm64 — asserted in kernel __init__).
    """
    b = np.ascontiguousarray(v, dtype=U64).view(np.uint8).reshape(-1, 8)
    nzb = b != 0
    any_nz = nzb.any(axis=1)
    # most significant nonzero byte (little-endian: byte 7 is most significant)
    msb_byte = 7 - np.argmax(nzb[:, ::-1], axis=1)
    rows = np.arange(b.shape[0])
    clz = (7 - msb_byte) * 8 + _CLZ8[b[rows, msb_byte]]
    clz[~any_nz] = 64
    return clz


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HyperLogLog(Sketch):
    KIND = "hll"

    def __init__(self, p: int = 12, *, registers: np.ndarray | None = None):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = int(p)
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def params(self) -> dict:
        return {"p": self.p}

    @property
    def rel_error(self) -> float:
        return 1.04 / (self.m**0.5)

    def update(self, keys: np.ndarray) -> "HyperLogLog":
        """`keys` must already be uniform 64-bit hashes (the pipeline feeds
        kernel.hashing outputs); raw small integers would all land in
        register 0 and estimate ~1."""
        if len(keys) == 0:
            return self
        keys = np.atleast_1d(np.asarray(keys, dtype=U64))
        idx = (keys >> U64(64 - self.p)).astype(np.int64)
        # low 64-p bits; rho = leading zeros within that field + 1
        rest = (keys << U64(self.p)) >> U64(self.p)
        nbits = 64 - self.p
        clz = _clz64(rest)  # exact, vectorized (byte LUT); 64 when rest == 0
        rho = np.minimum(clz - self.p + 1, nbits + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        self._check_mergeable(other)
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        regs = self.registers.astype(np.float64)
        raw = _alpha(self.m) * self.m * self.m / np.power(2.0, -regs).sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * self.m and zeros > 0:
            return self.m * np.log(self.m / zeros)  # linear counting
        return float(raw)

    def _body(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def _from_body(cls, params: dict, body: bytes) -> "HyperLogLog":
        return cls(params["p"], registers=np.frombuffer(body, dtype=np.uint8).copy())
