"""Conversion between Python integers and 12-bit-limb int32 arrays.

The whole framework represents big integers as little-endian arrays of
12-bit limbs stored in ``int32`` lanes, shape ``[..., L]``.  This is the
TPU-native analogue of the reference's ``[u64; 6]`` / ``[u64; 4]`` reprs
(``pairing/src/bls12_381/fq.rs:511``, ``fr.rs:58``).  12-bit limbs leave
enough headroom that a full schoolbook product row (up to ~33 partial
products of 24 bits each) accumulates exactly in an int32 lane with *no*
per-step carry propagation — the same reason the reference's OpenCL port
split u64 into u32 halves (``bellman/src/bls12-381.cl:6-20``), taken one
step further for carry-free vector lanes.
"""

from __future__ import annotations

import numpy as np

LIMB_BITS = 12
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int, n_limbs: int) -> np.ndarray:
    """Little-endian 12-bit limb decomposition of a non-negative int."""
    if x < 0:
        raise ValueError("negative")
    out = np.zeros((n_limbs,), dtype=np.int32)
    for i in range(n_limbs):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    if x:
        raise ValueError("integer does not fit in limb count")
    return out


def ints_to_limbs(xs, n_limbs: int) -> np.ndarray:
    """Vectorized ``int_to_limbs`` for a sequence of ints -> [n, L] int32."""
    out = np.zeros((len(xs), n_limbs), dtype=np.int32)
    for r, x in enumerate(xs):
        out[r] = int_to_limbs(int(x), n_limbs)
    return out


def limbs_to_int(a) -> int:
    """Recompose a single limb vector [L] into a Python int.

    Works on *any* non-negative limb values (lazy/redundant representations
    included): the value is the plain weighted sum of limbs.
    """
    a = np.asarray(a)
    assert a.ndim == 1
    x = 0
    for i in range(a.shape[0] - 1, -1, -1):
        x = (x << LIMB_BITS) + int(a[i])
    return x


def limbs_to_ints(a) -> list:
    """Recompose [..., L] limb arrays into a flat list of Python ints."""
    a = np.asarray(a)
    flat = a.reshape(-1, a.shape[-1])
    return [limbs_to_int(row) for row in flat]
