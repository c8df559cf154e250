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


def ints_to_limbs_fast(xs, n_limbs: int) -> np.ndarray:
    """Vectorized bulk conversion: python ints -> [n, L] 12-bit limbs.

    Routes through little-endian bytes + numpy bit slicing (two limbs per
    three bytes); ~100x faster than the per-int loop for 2^17-element
    vectors.
    """
    n = len(xs)
    if n == 0:
        return np.zeros((0, n_limbs), dtype=np.int32)
    pairs = (n_limbs + 1) // 2
    nbytes = pairs * 3
    buf = b"".join(int(x).to_bytes(nbytes, "little") for x in xs)
    arr = np.frombuffer(buf, np.uint8).reshape(n, pairs, 3).astype(np.int32)
    lo = arr[..., 0] | ((arr[..., 1] & 0xF) << 8)
    hi = (arr[..., 1] >> 4) | (arr[..., 2] << 4)
    out = np.stack([lo, hi], axis=-1).reshape(n, 2 * pairs)
    return np.ascontiguousarray(out[:, :n_limbs])


def limbs_to_ints_fast(a) -> list:
    """Vectorized bulk recompose: [..., L] canonical 12-bit digits -> ints.

    Only valid for canonical digits (< 2^12); lazy/redundant limbs must go
    through ``limbs_to_ints``.
    """
    a = np.asarray(a)
    flat = a.reshape(-1, a.shape[-1]).astype(np.int64)
    assert flat.size == 0 or (0 <= flat.min() and flat.max() < (1 << LIMB_BITS))
    n, L = flat.shape
    pairs = (L + 1) // 2
    if L % 2:
        flat = np.concatenate([flat, np.zeros((n, 1), np.int64)], axis=1)
    lo = flat[:, 0::2]
    hi = flat[:, 1::2]
    b = np.empty((n, pairs, 3), dtype=np.uint8)
    b[..., 0] = lo & 0xFF
    b[..., 1] = (lo >> 8) | ((hi & 0xF) << 4)
    b[..., 2] = hi >> 4
    byts = b.reshape(n, pairs * 3).tobytes()
    step = pairs * 3
    return [
        int.from_bytes(byts[i * step : (i + 1) * step], "little")
        for i in range(n)
    ]


def pack_limbs_bytes(a: "np.ndarray") -> "np.ndarray":
    """[n, L] 12-bit limb array (L even) -> [n, 3L/2] uint8: two limbs
    per three little-endian bytes — the densest lossless wire form for
    canonical limbs.  Inverse of :func:`unpack_limbs_bytes`; host->device
    uploads shrink 25% vs int16 (the 2M-variable Sprout assignment is a
    ~106 MB int16 transfer through the tunnel)."""
    import numpy as np

    n, L = a.shape
    assert L % 2 == 0
    a = a.astype(np.int32)
    lo = a[:, 0::2]
    hi = a[:, 1::2]
    out = np.empty((n, L // 2, 3), np.uint8)
    out[:, :, 0] = lo & 0xFF
    out[:, :, 1] = (lo >> 8) | ((hi & 0xF) << 4)
    out[:, :, 2] = hi >> 4
    return out.reshape(n, 3 * L // 2)


def unpack_limbs_bytes(b, L: int):
    """Device-side inverse of :func:`pack_limbs_bytes`: [n, 3L/2] uint8
    -> [n, L] int16 limbs (jnp; cheap bit ops, jit-safe)."""
    import jax.numpy as jnp

    n = b.shape[0]
    t = b.reshape(n, L // 2, 3).astype(jnp.int16)
    lo = t[:, :, 0] | ((t[:, :, 1] & 0xF) << 8)
    hi = (t[:, :, 1] >> 4) | (t[:, :, 2] << 4)
    return jnp.stack([lo, hi], axis=-1).reshape(n, L)
