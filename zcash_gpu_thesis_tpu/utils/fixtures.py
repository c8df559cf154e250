"""Benchmark fixture generation and binary I/O.

Re-design of the reference's fixture tooling: ``generate_points``
(ec.rs:2527-2552, 10M seeded (G1, Fr) pairs in Debug-text format) and
``load_data`` (multiexp.rs:392-440, scan_fmt + transmute).  TPU-native
version: a seeded xorshift128 stream feeding scalars, points derived as
multiples of the generator computed on device, stored in a packed binary
format (48-byte LE x || 48-byte LE y || 32-byte LE scalar per record)
that the native C++ repacker can bulk-load straight into limb arrays.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ..constants import Q, R

MAGIC = b"ZKTPUFX1"
SEED = (0x5DBE6259, 0x8D313D76, 0x3237DB17, 0xE5BC0654)  # ec.rs:2539


class XorShift128:
    """The reference generator's xorshift128 stream (rand 0.4 XorShiftRng)."""

    def __init__(self, seed=SEED):
        self.x, self.y, self.z, self.w = seed

    def next_u32(self) -> int:
        t = (self.x ^ (self.x << 11)) & 0xFFFFFFFF
        self.x, self.y, self.z = self.y, self.z, self.w
        self.w = (self.w ^ (self.w >> 19)) ^ (t ^ (t >> 8))
        self.w &= 0xFFFFFFFF
        return self.w

    def next_u64(self) -> int:
        lo = self.next_u32()
        return lo | (self.next_u32() << 32)

    def fr(self) -> int:
        """Rejection-sample a canonical Fr element (Fr::rand semantics:
        4 u64 limbs, shave the top bit, retry until < r)."""
        while True:
            v = 0
            for i in range(4):
                v |= self.next_u64() << (64 * i)
            v &= (1 << 255) - 1  # REPR_SHAVE_BITS = 1
            if v < R:
                return v


def generate(path: str, n: int, base_points: int = 256,
             use_device: bool = True):
    """Write n (point, scalar) records.  Points are k_i*G for seeded
    scalars k_i drawn from a small pool (computed on device via the
    batched fixed-base scan); scalars are the seeded xorshift stream."""
    rng = XorShift128()
    pool_scalars = [rng.fr() for _ in range(base_points)]
    from ..groth16.engine import BlsEngine

    pool = BlsEngine().fixed_base_g1(pool_scalars)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", n))
        for i in range(n):
            p = pool[i % base_points]
            s = rng.fr()
            f.write(int(p[0]).to_bytes(48, "little"))
            f.write(int(p[1]).to_bytes(48, "little"))
            f.write(int(s).to_bytes(32, "little"))


def load(path: str, limit: int = None):
    """Read records -> (x_limbs [n, 33], y_limbs [n, 33], scalar_digits
    host ints).  Uses the native C++ repacker when available."""
    from .. import native
    from ..ops import field as F

    with open(path, "rb") as f:
        magic = f.read(8)
        assert magic == MAGIC, "bad fixture file"
        (n,) = struct.unpack("<Q", f.read(8))
        if limit is not None:
            n = min(n, limit)
        rec = 48 + 48 + 32
        data = f.read(n * rec)
    arr = np.frombuffer(data, np.uint8).reshape(n, rec)
    xs = np.ascontiguousarray(arr[:, :48]).tobytes()
    ys = np.ascontiguousarray(arr[:, 48:96]).tobytes()
    ss = np.ascontiguousarray(arr[:, 96:]).tobytes()
    x_l = native.bytes_to_limbs(xs, n, 48, F.FQ.n_limbs)
    y_l = native.bytes_to_limbs(ys, n, 48, F.FQ.n_limbs)
    s_l = native.bytes_to_limbs(ss, n, 32, F.FR.n_limbs)
    return x_l, y_l, s_l


def to_mont_points(x_l, y_l):
    """Canonical limb arrays -> Montgomery-form affine pytree (device)."""
    import jax.numpy as jnp

    from ..ops import field as F

    x = F.to_mont(F.FQ, jnp.asarray(x_l))
    y = F.to_mont(F.FQ, jnp.asarray(y_l))
    inf = jnp.zeros((x_l.shape[0],), dtype=bool)
    return (x, y, inf)
