"""Vectorized prime-field arithmetic on 16-bit limbs in int32 lanes.

TPU-native re-design of the reference's Montgomery field layer
(``pairing/src/bls12_381/fq.rs`` / ``fr.rs`` on CPU and the CIOS OpenCL port
``bellman/src/bls12-381.cl:191-1700``).  Instead of array-of-structs with
u64 carry chains, every element is a little-endian array of 16-bit limbs in
``int32`` lanes, shape ``[..., L]``, and every operation is batch-first: the
batch axis is the VPU vector axis, the limb axis is short and static.

Key invariants:
  * canonical elements have every limb in [0, 2^16) and value < modulus;
  * Montgomery form uses R = 2^(16*L)  (2^384 for Fq, 2^256 for Fr), the
    same R as the reference (fq.rs R / fr.rs R), so Montgomery-domain
    integers match bellman bit-for-bit;
  * 16x16-bit limb products are exact in wrapped int32; lo/hi 16-bit halves
    are extracted with ``& 0xffff`` and ``(>> 16) & 0xffff`` (correct under
    two's-complement wrap), and partial sums of <= ~2^6 such halves stay far
    below 2^31, so no other overflow handling is needed.

Inner limb loops use ``lax.scan`` / ``lax.fori_loop`` so each field op stays
~O(100) HLO ops: these primitives get nested inside MSM segment-scans and
NTT stages, where unrolled carry chains would multiply graph size.

All functions are pure and jit-/vmap-/shard_map-compatible.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import FQ_LIMBS, FR_LIMBS, LIMB_BITS, Q, R, modinv
from ..utils.limbs import int_to_limbs, limbs_to_int

MASK = (1 << LIMB_BITS) - 1


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static description of a prime field in 16-bit-limb representation."""

    name: str
    modulus: int
    n_limbs: int

    def __post_init__(self):
        object.__setattr__(self, "bits", self.modulus.bit_length())
        object.__setattr__(self, "r", pow(2, self.n_limbs * LIMB_BITS, self.modulus))
        object.__setattr__(self, "r2", pow(2, 2 * self.n_limbs * LIMB_BITS, self.modulus))
        object.__setattr__(
            self, "inv16", (-modinv(self.modulus, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        )
        object.__setattr__(self, "mod_limbs", int_to_limbs(self.modulus, self.n_limbs))

    # -- host-side conversions ---------------------------------------------

    def to_limbs(self, x: int) -> np.ndarray:
        return int_to_limbs(x % self.modulus, self.n_limbs)

    def to_mont_int(self, x: int) -> int:
        return (x % self.modulus) * self.r % self.modulus

    def from_mont_int(self, x: int) -> int:
        return x * modinv(self.r, self.modulus) % self.modulus


FQ = FieldSpec("Fq", Q, FQ_LIMBS)
FR = FieldSpec("Fr", R, FR_LIMBS)


# ---------------------------------------------------------------------------
# Limb-level helpers.
# ---------------------------------------------------------------------------


def _carry_norm(t, n_out):
    """Propagate carries over nonneg int32 limbs t[.., K]; emit n_out limbs.

    Values in ``t`` must be < 2^31.  Returns (normalized [.., n_out] limbs,
    leftover carry [.., 1]).  Implemented as a scan over the limb axis.
    """
    k = t.shape[-1]
    if k < n_out:
        pad = jnp.zeros(t.shape[:-1] + (n_out - k,), dtype=jnp.int32)
        t = jnp.concatenate([t, pad], axis=-1)
    tm = jnp.moveaxis(t[..., :n_out], -1, 0)  # [n_out, ...]
    rest = t[..., n_out:]

    def body(carry, v):
        s = v + carry
        return s >> LIMB_BITS, s & MASK

    carry0 = jnp.zeros(t.shape[:-1], dtype=jnp.int32)
    carry, outs = lax.scan(body, carry0, tm)
    # Any limbs beyond n_out are the caller-declared overflow region.
    if rest.shape[-1]:
        carry = carry + jnp.sum(rest, axis=-1)  # caller guarantees zero/known
    return jnp.moveaxis(outs, 0, -1), carry[..., None]


def _borrow_sub(a, b, n):
    """a - b limb-wise with borrow chain; returns (diff[.., n], borrow[.., 1])."""
    am = jnp.moveaxis(a, -1, 0)
    bm = jnp.moveaxis(jnp.broadcast_to(b, a.shape), -1, 0)

    def body(borrow, ab):
        ai, bi = ab
        t = ai - bi - borrow
        return (t >> 31) & 1, t & MASK

    borrow0 = jnp.zeros(a.shape[:-1], dtype=jnp.int32)
    borrow, outs = lax.scan(body, borrow0, (am, bm))
    return jnp.moveaxis(outs, 0, -1), borrow[..., None]


def _cond_sub_modulus(spec: FieldSpec, s, overflow):
    """Return s - p if (overflow | s >= p) else s; s has canonical limbs."""
    p = jnp.asarray(spec.mod_limbs, dtype=jnp.int32)
    d, borrow = _borrow_sub(s, p, spec.n_limbs)
    ge = jnp.logical_or(overflow[..., 0] != 0, borrow[..., 0] == 0)
    return jnp.where(ge[..., None], d, s)


# ---------------------------------------------------------------------------
# Public field ops.  All take/return int32 [..., L] canonical limbs.
# ---------------------------------------------------------------------------


def zeros(spec: FieldSpec, shape=()):
    return jnp.zeros(tuple(shape) + (spec.n_limbs,), dtype=jnp.int32)


def const(spec: FieldSpec, x: int, shape=()):
    """Broadcast a host integer (reduced mod p) as limbs."""
    v = jnp.asarray(spec.to_limbs(x), dtype=jnp.int32)
    return jnp.broadcast_to(v, tuple(shape) + (spec.n_limbs,))


def mont_const(spec: FieldSpec, x: int, shape=()):
    """Host integer -> Montgomery-form limb constant."""
    return const(spec, spec.to_mont_int(x), shape)


def one_mont(spec: FieldSpec, shape=()):
    return const(spec, spec.r, shape)


def is_zero(spec: FieldSpec, a):
    return jnp.all(a == 0, axis=-1)


def eq(spec: FieldSpec, a, b):
    return jnp.all(a == b, axis=-1)


def select(mask, a, b):
    """where(mask, a, b) with mask broadcast over the limb axis."""
    return jnp.where(mask[..., None], a, b)


def add(spec: FieldSpec, a, b):
    s, carry = _carry_norm(a + b, spec.n_limbs)
    return _cond_sub_modulus(spec, s, carry)


def double(spec: FieldSpec, a):
    return add(spec, a, a)


def sub(spec: FieldSpec, a, b):
    b = jnp.broadcast_to(b, jnp.broadcast_shapes(a.shape, b.shape))
    a = jnp.broadcast_to(a, b.shape)
    d, borrow = _borrow_sub(a, b, spec.n_limbs)
    # If we borrowed, add the modulus back.
    p = jnp.asarray(spec.mod_limbs, dtype=jnp.int32)
    s, _ = _carry_norm(d + p, spec.n_limbs)
    return jnp.where(borrow[..., 0:1] != 0, s, d)


def neg(spec: FieldSpec, a):
    p = jnp.broadcast_to(jnp.asarray(spec.mod_limbs, dtype=jnp.int32), a.shape)
    d, _ = _borrow_sub(p, a, spec.n_limbs)
    return jnp.where(is_zero(spec, a)[..., None], jnp.zeros_like(a), d)


def _mul_wide(a, b, n):
    """Schoolbook product of n-limb operands -> normalized 2n-limb result."""
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, shape + (n,))
    b = jnp.broadcast_to(b, shape + (n,))
    acc = jnp.zeros(shape + (2 * n,), dtype=jnp.int32)
    zcol = jnp.zeros(shape + (1,), dtype=jnp.int32)

    def body(i, acc):
        ai = lax.dynamic_slice_in_dim(a, i, 1, axis=-1)  # [.., 1]
        p = ai * b  # wrapped int32; bits exact
        lo = p & MASK
        hi = (p >> LIMB_BITS) & MASK
        contrib = jnp.concatenate([lo, zcol], axis=-1) + jnp.concatenate(
            [zcol, hi], axis=-1
        )  # [.., n+1], values <= 2*0xffff
        cur = lax.dynamic_slice_in_dim(acc, i, n + 1, axis=-1)
        return lax.dynamic_update_slice_in_dim(acc, cur + contrib, i, axis=-1)

    acc = lax.fori_loop(0, n, body, acc)
    # acc values <= 2n * 2^16 < 2^22: one carry pass normalizes; the product
    # is < 2^(32n) so the final carry is zero.
    t, _ = _carry_norm(acc, 2 * n)
    return t


def mont_reduce(spec: FieldSpec, t):
    """Montgomery reduction of a normalized 2L-limb value -> canonical [L].

    Semantics match the reference's ``mont_reduce`` (fq.rs / bls12-381.cl:558):
    result = t * 2^(-16L) mod p, canonical (< p).  Requires t < p * 2^(16L).
    """
    n = spec.n_limbs
    assert t.shape[-1] == 2 * n
    inv16 = int(spec.inv16)
    q = jnp.asarray(spec.mod_limbs, dtype=jnp.int32)
    shape = t.shape[:-1]
    zcol = jnp.zeros(shape + (1,), dtype=jnp.int32)
    # Extra top limb absorbs the final hi-half carries.
    t = jnp.concatenate([t, zcol], axis=-1)  # [.., 2n+1]

    def body(i, t):
        ti = lax.dynamic_slice_in_dim(t, i, 1, axis=-1)
        m = (ti * inv16) & MASK  # -t_i / q mod 2^16
        p = m * q  # [.., n] wrapped int32; bits exact
        lo = p & MASK
        hi = (p >> LIMB_BITS) & MASK
        contrib = jnp.concatenate([lo, zcol], axis=-1) + jnp.concatenate(
            [zcol, hi], axis=-1
        )
        cur = lax.dynamic_slice_in_dim(t, i, n + 1, axis=-1)
        new = cur + contrib
        # new[0] is now 0 mod 2^16; push its carry one limb up, retire limb i.
        carry = new[..., 0:1] >> LIMB_BITS
        new = new.at[..., 1:2].add(carry)
        return lax.dynamic_update_slice_in_dim(t, new, i, axis=-1)

    t = lax.fori_loop(0, n, body, t)
    s, _ = _carry_norm(t[..., n:], n + 1)
    return _cond_sub_modulus(spec, s[..., :n], s[..., n:])


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product: (a * b * R^-1) mod p, canonical limbs."""
    return mont_reduce(spec, _mul_wide(a, b, spec.n_limbs))


def mont_square(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a):
    r2 = jnp.asarray(int_to_limbs(spec.r2, spec.n_limbs), dtype=jnp.int32)
    return mont_mul(spec, a, jnp.broadcast_to(r2, a.shape))


def from_mont(spec: FieldSpec, a):
    pad = jnp.zeros_like(a)
    return mont_reduce(spec, jnp.concatenate([a, pad], axis=-1))


def pow_const(spec: FieldSpec, a, e: int):
    """a^e (Montgomery in, Montgomery out) for a static exponent e >= 0.

    Square-and-multiply driven by a ``lax.scan`` over the (static) bits of e
    — compiler-friendly control flow, graph size O(1) in the exponent.
    """
    if e == 0:
        return one_mont(spec, a.shape[:-1])
    nbits = e.bit_length()
    bits = jnp.asarray(
        [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.int32
    )

    def body(acc, bit):
        acc = mont_square(spec, acc)
        withmul = mont_mul(spec, acc, a)
        acc = jnp.where(bit != 0, withmul, acc)
        return acc, None

    # First bit is always 1: start from a.
    out, _ = jax.lax.scan(body, a, bits[1:])
    return out


def inv(spec: FieldSpec, a):
    """Batched modular inverse via Fermat: a^(p-2). inv(0) = 0."""
    return pow_const(spec, a, spec.modulus - 2)


def batch_inv(spec: FieldSpec, a):
    """Montgomery-trick batch inversion along the leading axis.

    Replaces n Fermat inversions with 1 inversion + 3(n-1) multiplications
    (prefix/suffix products), a large win for batch affine conversions.
    Zero entries map to zero.
    """
    zero_mask = is_zero(spec, a)
    safe = jnp.where(zero_mask[..., None], one_mont(spec, a.shape[:-1]), a)

    def fwd(acc, x):
        nacc = mont_mul(spec, acc, x)
        return nacc, acc  # prefix product *excluding* x

    total, prefix = lax.scan(fwd, one_mont(spec), safe)
    total_inv = inv(spec, total)

    def bwd(acc, xp):
        x, pre = xp
        out = mont_mul(spec, acc, pre)  # = inv(x) when acc = inv(prod up to x)
        nacc = mont_mul(spec, acc, x)
        return nacc, out

    _, outs = lax.scan(bwd, total_inv, (safe, prefix), reverse=True)
    return jnp.where(zero_mask[..., None], jnp.zeros_like(a), outs)


def batch_to_limbs(spec: FieldSpec, xs, mont: bool = True) -> np.ndarray:
    """Host helper: python ints -> [n, L] canonical limbs (Montgomery form)."""
    out = np.zeros((len(xs), spec.n_limbs), dtype=np.int32)
    for i, x in enumerate(xs):
        v = spec.to_mont_int(int(x)) if mont else int(x) % spec.modulus
        out[i] = int_to_limbs(v, spec.n_limbs)
    return out


def batch_from_limbs(spec: FieldSpec, a, mont: bool = True) -> list:
    """Host helper: [..., L] limbs -> python ints (out of Montgomery form)."""
    a = np.asarray(a)
    flat = a.reshape(-1, spec.n_limbs)
    out = []
    for row in flat:
        v = limbs_to_int(row)
        out.append(spec.from_mont_int(v) if mont else v)
    return out
