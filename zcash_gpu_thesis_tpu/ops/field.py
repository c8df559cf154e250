"""Carry-free lazy-reduction prime-field arithmetic on 12-bit limbs.

TPU-native re-design of the reference's Montgomery field layer
(``pairing/src/bls12_381/fq.rs`` / ``fr.rs`` on CPU and the CIOS OpenCL port
``bellman/src/bls12-381.cl:191-1700``).  The reference's CIOS loop is a long
serial carry chain — exactly what vector lanes cannot do.  Here every element
is a little-endian array of 12-bit limbs in ``int32`` lanes, shape
``[..., L]``, and *all* hot-path operations are straight-line vector code
with **no** ``lax.scan`` / sequential carry propagation:

  * 12x12-bit limb products are < 2^24, so a full schoolbook product row
    (<= 33 partial products) accumulates exactly in an int32 lane — the
    convolution needs no interleaved carries at all;
  * carries are then resolved by a fixed 3-round parallel "ripple"
    (mask + shift + add), which provably reduces any < 2^30 accumulator
    limbs to <= 2^12 + 1;
  * Montgomery reduction is the full-width REDC (m = t*N' mod R;
    t' = (t + m*q) / R) built from two *constant-operand* convolutions,
    plus an exact final carry obtained from a zero-test of the low half —
    t_lo + (m*q)_lo is 0 or exactly R, never anything else;
  * values are kept *lazily reduced*: the standing invariant is
    ``value < 2*B`` (B = 2^(12*FOLD), B >= 8p) with non-negative limbs
    <= 2^12 + 2.  add/sub/small-multiples restore the invariant with a
    cheap "fold" of the top limb(s) against delta = B mod p — never a
    comparison, never a conditional subtract.

Only boundary operations (canonicalization for I/O and equality) use an
exact serial carry pass; they are out of every hot loop.

All functions are pure and jit-/vmap-/shard_map-compatible.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import FQ_FOLD, FQ_LIMBS, FR_FOLD, FR_LIMBS, LIMB_BITS, Q, R, modinv
from ..utils.limbs import int_to_limbs, limbs_to_int

MASK = (1 << LIMB_BITS) - 1
LMAX = (1 << LIMB_BITS) + 2  # max limb value under the standing invariant


def _digits_in_range(value: int, lows, highs, base: int = 1 << LIMB_BITS):
    """Find digits d_k in [lows[k], highs[k]] with sum d_k base^k == value."""
    n = len(lows)
    lo_prefix = [0] * (n + 1)
    hi_prefix = [0] * (n + 1)
    for k in range(n):
        lo_prefix[k + 1] = lo_prefix[k] + lows[k] * base**k
        hi_prefix[k + 1] = hi_prefix[k] + highs[k] * base**k
    assert lo_prefix[n] <= value <= hi_prefix[n], "value outside digit range"
    out = [0] * n
    rem = value
    for k in range(n - 1, -1, -1):
        d = max(lows[k], -((hi_prefix[k] - rem) // base**k))  # ceil div
        assert lows[k] <= d <= highs[k]
        out[k] = d
        rem -= d * base**k
        assert lo_prefix[k] <= rem <= hi_prefix[k]
    assert rem == 0
    return out


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static description of a prime field in lazy 12-bit-limb representation.

    Derived quantities:
      * ``fold``: fold boundary index F; B = 2^(12F) >= 8p.  Invariant for
        every stored element: value < 2B, limbs non-negative <= 2^12+2.
      * ``r`` = R mod p with R = 2^(12L) (Montgomery radix), ``r2`` = R^2.
      * ``nprime_digits``: digits of -p^-1 mod R (for REDC).
      * ``delta_digits``: digits of B mod p (< p), used by the lazy fold.
      * ``sub_digits``: digits of a multiple M = c*p chosen so every digit
        dominates the invariant limb bound — M - y is limb-wise non-negative
        for any valid y, making subtraction carry-free.
    """

    name: str
    modulus: int
    n_limbs: int
    fold: int

    def __post_init__(self):
        p, L, F = self.modulus, self.n_limbs, self.fold
        B = 1 << (LIMB_BITS * F)
        assert B >= 8 * p, "fold boundary needs 3 bits of headroom"
        assert L >= F + 1
        # REDC validity: t = a*b < (2B)^2 must stay < R*p.
        assert 4 * B * B < (1 << (LIMB_BITS * L)) * p, "R too small for REDC"
        object.__setattr__(self, "bits", p.bit_length())
        object.__setattr__(self, "r", pow(2, L * LIMB_BITS, p))
        object.__setattr__(self, "r2", pow(2, 2 * L * LIMB_BITS, p))
        nprime = (-modinv(p, 1 << (L * LIMB_BITS))) % (1 << (L * LIMB_BITS))
        object.__setattr__(self, "p_digits", int_to_limbs(p, L))
        object.__setattr__(self, "nprime_digits", int_to_limbs(nprime, L))
        object.__setattr__(self, "delta_digits", int_to_limbs(B % p, L))
        # Dominating multiple of p for carry-free subtraction: digits in
        # [2^12+2, 2^13+3] below the fold limb, [2, 2^13+3] at the fold limb.
        lows = [LMAX] * F + [2] + [0] * (L - F - 1)
        highs = [(1 << (LIMB_BITS + 1)) + 3] * (F + 1) + [0] * (L - F - 1)
        vmin = sum(lows[k] << (LIMB_BITS * k) for k in range(L))
        c = -(-vmin // p)  # ceil
        m = c * p
        object.__setattr__(
            self, "sub_digits", np.asarray(_digits_in_range(m, lows, highs), np.int32)
        )
        object.__setattr__(self, "one_digits", int_to_limbs(self.r, L))
        object.__setattr__(self, "r2_digits", int_to_limbs(self.r2, L))

    # -- host-side conversions ---------------------------------------------

    def to_limbs(self, x: int) -> np.ndarray:
        return int_to_limbs(x % self.modulus, self.n_limbs)

    def to_mont_int(self, x: int) -> int:
        return (x % self.modulus) * self.r % self.modulus

    def from_mont_int(self, x: int) -> int:
        return x * modinv(self.r, self.modulus) % self.modulus


FQ = FieldSpec("Fq", Q, FQ_LIMBS, FQ_FOLD)
FR = FieldSpec("Fr", R, FR_LIMBS, FR_FOLD)


# ---------------------------------------------------------------------------
# Limb-level helpers (all straight-line vector code).
# ---------------------------------------------------------------------------


def _ripple(x, rounds: int):
    """Parallel carry resolution: `rounds` passes of mask/shift/add.

    Each pass replaces limb k by (x_k & MASK) + (x_{k-1} >> 12).  Values are
    preserved exactly provided the top limb never overflows 12 bits (true
    under the documented bounds).  Three rounds reduce any <2^30 accumulator
    to limbs <= 2^12 + 1.
    """
    zero = jnp.zeros(x.shape[:-1] + (1,), dtype=jnp.int32)
    for _ in range(rounds):
        carry = jnp.concatenate([zero, (x >> LIMB_BITS)[..., :-1]], axis=-1)
        x = (x & MASK) + carry
    return x


def _ripple_mod(x, rounds: int):
    """Like _ripple but drops carries out of the top limb (i.e. works
    mod 2^(12*n) — used when computing m = t*N' mod R in REDC)."""
    zero = jnp.zeros(x.shape[:-1] + (1,), dtype=jnp.int32)
    for _ in range(rounds):
        carry = jnp.concatenate([zero, (x >> LIMB_BITS)[..., :-1]], axis=-1)
        x = (x & MASK) + carry
    return x.at[..., -1].set(x[..., -1] & MASK)


def _fold(spec: FieldSpec, x):
    """Fold limbs >= F back below the boundary: x mod B + top*(B mod p).

    Keeps the residue class mod p; output value < B + (top+1)*p, so with
    top <= 7 the standing invariant (value < 2B) is restored.
    """
    F, L = spec.fold, spec.n_limbs
    top = x[..., F]
    for k in range(F + 1, L):
        top = top + (x[..., k] << (LIMB_BITS * (k - F)))
    delta = jnp.asarray(spec.delta_digits, dtype=jnp.int32)
    low = jnp.concatenate(
        [x[..., :F], jnp.zeros(x.shape[:-1] + (L - F,), dtype=jnp.int32)], axis=-1
    )
    return low + top[..., None] * delta


def _conv_unrolled(a, b, n):
    acc = jnp.zeros(a.shape[:-1] + (2 * n,), dtype=jnp.int32)
    for i in range(n):
        acc = acc.at[..., i : i + n].add(a[..., i : i + 1] * b)
    return acc


def _conv_looped(a, b, n):
    acc = jnp.zeros(a.shape[:-1] + (2 * n,), dtype=jnp.int32)

    def body(i, acc):
        ai = lax.dynamic_slice_in_dim(a, i, 1, axis=-1)
        cur = lax.dynamic_slice_in_dim(acc, i, n, axis=-1)
        return lax.dynamic_update_slice_in_dim(acc, cur + ai * b, i, axis=-1)

    return lax.fori_loop(0, n, body, acc)


def _unroll() -> bool:
    """Convolution scheduling: fully unrolled static slices fuse into one
    kernel on TPU (essential — a fori_loop would round-trip the accumulator
    through HBM 2L times per multiply); compact fori_loop graphs keep XLA
    *compile* times sane on the CPU test backend.  Both orderings perform
    bit-identical arithmetic."""
    from ..config import conv_unrolled

    return conv_unrolled()


def _conv(a, b):
    """Schoolbook convolution of two [.., L] limb arrays -> raw [.., 2L].

    No carries: products < 2^24 (+ redundancy slack), <= L of them per output
    limb, all exact in int32.
    """
    n = a.shape[-1]
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, shape + (n,))
    b = jnp.broadcast_to(b, shape + (n,))
    if _unroll():
        return _conv_unrolled(a, b, n)
    return _conv_looped(a, b, n)


_MXU_TOEPLITZ_CACHE = {}


def _redc_mxu() -> bool:
    """Constant-operand convolutions as int8 MXU matmuls (exact integer
    math, bit-identical to the VPU path).  The two REDC convolutions are
    ~2/3 of a Montgomery multiply's MAC count; the MXU does them
    essentially for free while the VPU handles the variable conv."""
    from ..config import redc_mxu

    return redc_mxu()


def _conv_const_mxu(a, digits, out_len: int):
    """a @ T with T[i, k] = digits[k-i], via 4 int8 x int8 -> int32 MXU
    matmuls after 7-bit limb splitting (values <= 2^12+2 = two int8s)."""
    n = a.shape[-1]
    key = (bytes(np.asarray(digits, np.int32).tobytes()), n, out_len)
    cached = _MXU_TOEPLITZ_CACHE.get(key)
    if cached is None:
        t = np.zeros((n, out_len), dtype=np.int32)
        for i in range(n):
            for k in range(out_len):
                j = k - i
                if 0 <= j < len(digits):
                    t[i, k] = int(digits[j])
        # cache host numpy (never traced jax values — they would leak
        # tracers across jit scopes)
        cached = ((t & 127).astype(np.int8), (t >> 7).astype(np.int8))
        _MXU_TOEPLITZ_CACHE[key] = cached
    t0, t1 = cached
    a0 = (a & 127).astype(jnp.int8)
    a1 = (a >> 7).astype(jnp.int8)

    def mm(x, w):
        return jax.lax.dot_general(
            x, w, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    return (
        mm(a0, t0)
        + ((mm(a0, t1) + mm(a1, t0)) << 7)
        + (mm(a1, t1) << 14)
    )


def _conv_const(a, digits, out_len: int):
    """Convolution of [.., n] limbs with a small host-constant digit vector,
    truncated to out_len output limbs (drops limbs >= out_len)."""
    n = a.shape[-1]
    if _redc_mxu():
        return _conv_const_mxu(a, digits, out_len)
    if _unroll():
        acc = jnp.zeros(a.shape[:-1] + (out_len,), dtype=jnp.int32)
        for j, d in enumerate(digits):
            d = int(d)
            if d == 0 or j >= out_len:
                continue
            width = min(n, out_len - j)
            acc = acc.at[..., j : j + width].add(d * a[..., :width])
        return acc
    # looped form: pad, accumulate at dynamic offsets, truncate
    dig = jnp.asarray(np.asarray(digits, dtype=np.int32))
    nd = dig.shape[0]
    acc = jnp.zeros(a.shape[:-1] + (out_len + n,), dtype=jnp.int32)

    def body(j, acc):
        d = lax.dynamic_slice_in_dim(dig, j, 1)
        cur = lax.dynamic_slice_in_dim(acc, j, n, axis=-1)
        return lax.dynamic_update_slice_in_dim(acc, cur + d * a, j, axis=-1)

    acc = lax.fori_loop(0, min(nd, out_len), body, acc)
    return acc[..., :out_len]


# ---------------------------------------------------------------------------
# Public field ops.  All take/return int32 [..., L] lazy limbs
# (non-negative, <= 2^12+2, value < 2B) unless stated otherwise.
# ---------------------------------------------------------------------------


def zeros(spec: FieldSpec, shape=()):
    return jnp.zeros(tuple(shape) + (spec.n_limbs,), dtype=jnp.int32)


def const(spec: FieldSpec, x: int, shape=()):
    """Broadcast a host integer (reduced mod p) as canonical limbs."""
    v = jnp.asarray(spec.to_limbs(x), dtype=jnp.int32)
    return jnp.broadcast_to(v, tuple(shape) + (spec.n_limbs,))


def mont_const(spec: FieldSpec, x: int, shape=()):
    """Host integer -> Montgomery-form limb constant."""
    return const(spec, spec.to_mont_int(x), shape)


def one_mont(spec: FieldSpec, shape=()):
    return const(spec, spec.r, shape)


def select(mask, a, b):
    """where(mask, a, b) with mask broadcast over the limb axis."""
    return jnp.where(mask[..., None], a, b)


def _normalize(spec: FieldSpec, x):
    """Restore the invariant after a bounded accumulation: one carry round so
    the top limb reflects the value, fold it, two rounds to settle limbs.
    Correct for any x with limbs < 2^18 and value < 8B."""
    return _ripple(_fold(spec, _ripple(x, 1)), 2)


def add(spec: FieldSpec, a, b):
    return _normalize(spec, a + b)


def add3(spec: FieldSpec, a, b, c):
    """a + b + c with a single normalization (value < 6B — still safe)."""
    return _normalize(spec, a + b + c)


def double(spec: FieldSpec, a):
    return add(spec, a, a)


def sub(spec: FieldSpec, a, b):
    """a - b via the carry-free dominating-multiple trick: a + (M - b).

    M's digits dominate any valid operand's limbs, so M - b is limb-wise
    non-negative: no borrows exist anywhere in the pipeline.
    """
    m = jnp.asarray(spec.sub_digits, dtype=jnp.int32)
    return _normalize(spec, a + (m - b))


def neg(spec: FieldSpec, a):
    m = jnp.asarray(spec.sub_digits, dtype=jnp.int32)
    return _normalize(spec, m - a)


def mul_small(spec: FieldSpec, a, k: int):
    """a * k for a small static non-negative integer k (k <= 20)."""
    assert 0 <= k <= 20
    if k == 0:
        return zeros(spec, a.shape[:-1])
    if k == 1:
        return a
    x = _ripple(_fold(spec, _ripple(a * k, 1)), 1)
    if k > 3:  # value was < 2kB: one fold leaves < ~(k/4+1.1)B; fold again
        x = _fold(spec, x)
    return _ripple(x, 2)


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product: value(a)*value(b)*R^-1 mod p, lazily reduced.

    Full-width REDC (semantics of the reference's mont_reduce, fq.rs /
    bls12-381.cl:558, re-derived for carry-free vector lanes):
      t  = a*b                      (variable x variable convolution)
      m  = (t mod R) * N' mod R     (constant-operand convolution)
      t' = (t + m*p) / R            (constant-operand convolution + exact
                                     carry via zero-test of the low half)
    Output < p*(1 + 2^-11) + tiny — comfortably inside the invariant.
    """
    L = spec.n_limbs
    # Ripple-round budget: raw conv limbs are < 2^30, so TWO rounds bring
    # them to <= 2^12 + 2^6 — enough for every consumer (the REDC const-
    # conv splits need < 2^14; follow-on products stay < 2^30).  Only the
    # final s pass uses three rounds, to restore the standing <= 2^12+2
    # limb invariant.  The low-half zero-test is round-count independent:
    # rippling preserves "low-half value in {0, R}" (each carry escaping
    # into limb L subtracts exactly R), and non-negative limbs are all
    # zero iff the value is zero.
    t = _ripple(_conv(a, b), 2)
    m = _ripple_mod(_conv_const(t[..., :L], spec.nprime_digits, L), 2)
    s = _ripple(_conv_const(m, spec.p_digits, 2 * L) + t, 3)
    # Low half's value is 0 or exactly R (it is ==0 mod R and < R(1+eps)):
    # the carry into the high half is 1 unless every low limb is zero.
    carry = jnp.any(s[..., :L] != 0, axis=-1).astype(jnp.int32)
    return s[..., L:].at[..., 0].add(carry)


def mont_square(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a):
    """Canonical standard-form limbs -> Montgomery form."""
    r2 = jnp.asarray(spec.r2_digits, dtype=jnp.int32)
    return mont_mul(spec, a, jnp.broadcast_to(r2, a.shape))


def from_mont(spec: FieldSpec, a):
    """Montgomery form -> canonical standard-form limbs (boundary op)."""
    one = jnp.asarray(int_to_limbs(1, spec.n_limbs), dtype=jnp.int32)
    return canon(spec, mont_mul(spec, a, jnp.broadcast_to(one, a.shape)), weak=True)


# ---------------------------------------------------------------------------
# Boundary ops: exact canonicalization, equality, inversion.
# ---------------------------------------------------------------------------


def _carry_exact(x):
    """Exact serial carry propagation (boundary only): limbs -> canonical
    digits < 2^12 of the same value.  Assumes no overflow out of the top."""
    xm = jnp.moveaxis(x, -1, 0)

    def body(carry, v):
        s = v + carry
        return s >> LIMB_BITS, s & MASK

    carry0 = jnp.zeros(x.shape[:-1], dtype=jnp.int32)
    carry, outs = lax.scan(body, carry0, xm)
    return jnp.moveaxis(outs, 0, -1)


def _cond_sub_p(spec: FieldSpec, x):
    """x - p if x >= p else x, for exact-digit x < 2p (boundary only)."""
    p = jnp.asarray(spec.p_digits, dtype=jnp.int32)
    d = x - p
    dm = jnp.moveaxis(d, -1, 0)

    def body(borrow, v):
        s = v - borrow
        return (s >> 31) & 1, s & MASK

    borrow0 = jnp.zeros(x.shape[:-1], dtype=jnp.int32)
    borrow, outs = lax.scan(body, borrow0, dm)
    sub_res = jnp.moveaxis(outs, 0, -1)
    return jnp.where((borrow != 0)[..., None], x, sub_res)


def canon(spec: FieldSpec, a, weak: bool = False):
    """Exact canonical digits (< 2^12, value < p) of the residue of `a`.

    The residue class (and the Montgomery-form-ness) of `a` is preserved:
    lazy limbs in, canonical digits of the same field element out.
    With weak=True the input is assumed already < ~1.1p (e.g. fresh out of
    mont_mul), skipping the range-reduction multiply.
    """
    if not weak:
        # Multiply by R (Montgomery-multiply by R^2... no: by digits of R
        # mod p) to reduce the value into [0, ~1.01p) without changing the
        # residue: mont_mul(a, R mod p) = a * R / R = a  (mod p).
        rdig = jnp.asarray(spec.one_digits, dtype=jnp.int32)
        a = mont_mul(spec, a, jnp.broadcast_to(rdig, a.shape))
    a = _carry_exact(a)
    return _cond_sub_p(spec, a)


def is_zero(spec: FieldSpec, a):
    """Exact zero test of the residue (boundary op)."""
    return jnp.all(canon(spec, a) == 0, axis=-1)


def eq(spec: FieldSpec, a, b):
    """Exact residue equality (boundary op)."""
    return jnp.all(canon(spec, a) == canon(spec, b), axis=-1)


def pow_const(spec: FieldSpec, a, e: int):
    """a^e (Montgomery in/out) for a static exponent e >= 0.

    Square-and-multiply via lax.scan over the (static) bits of e —
    graph size O(1) in the exponent.
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

    out, _ = lax.scan(body, a, bits[1:])  # first bit of e is always 1
    return out


def inv(spec: FieldSpec, a):
    """Batched modular inverse via Fermat: a^(p-2). inv(0) = 0."""
    return pow_const(spec, a, spec.modulus - 2)


def batch_inv(spec: FieldSpec, a):
    """Montgomery-trick batch inversion along the leading axis.

    Replaces n Fermat inversions with 1 inversion + 3(n-1) multiplications
    (prefix/suffix products).  Zero entries map to zero.
    """
    zero_mask = is_zero(spec, a)
    safe = select(zero_mask, one_mont(spec, a.shape[:-1]), a)

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
    return select(zero_mask, jnp.zeros_like(a), outs)


# ---------------------------------------------------------------------------
# Host helpers.
# ---------------------------------------------------------------------------


# Bulk-conversion threshold: below it the per-int python loop wins (no
# device dispatch); above it the vectorized byte-repack + one device
# Montgomery multiply is ~100x faster (131k Sapling-sized vectors).
_BULK_N = 64

_BULK_JIT = {}


def _bulk_fns(spec: FieldSpec):
    import jax

    fns = _BULK_JIT.get(spec.name)
    if fns is None:
        fns = (
            jax.jit(lambda a: canon(spec, to_mont(spec, a), weak=True)),
            jax.jit(lambda a: from_mont(spec, a)),
            jax.jit(lambda a: canon(spec, a)),
        )
        _BULK_JIT[spec.name] = fns
    return fns


def batch_to_limbs(spec: FieldSpec, xs, mont: bool = True) -> np.ndarray:
    """Host helper: python ints -> [n, L] canonical limbs (Montgomery form).

    Large batches go through the vectorized byte repack
    (utils.limbs.ints_to_limbs_fast) with the R-multiply done on device —
    bit-identical to the per-int path (canonical digits of x*R mod p)."""
    if len(xs) >= _BULK_N:
        from ..utils.limbs import ints_to_limbs_fast

        arr = ints_to_limbs_fast([int(x) % spec.modulus for x in xs],
                                 spec.n_limbs)
        if not mont:
            return arr
        to_mont_fn, _, _ = _bulk_fns(spec)
        return np.asarray(to_mont_fn(arr))
    out = np.zeros((len(xs), spec.n_limbs), dtype=np.int32)
    for i, x in enumerate(xs):
        v = spec.to_mont_int(int(x)) if mont else int(x) % spec.modulus
        out[i] = int_to_limbs(v, spec.n_limbs)
    return out


def batch_from_limbs(spec: FieldSpec, a, mont: bool = True) -> list:
    """Host helper: [..., L] lazy limbs -> python ints (out of Montgomery
    form if mont=True).

    Large batches canonicalize on device (exact boundary ops) and
    recompose with the vectorized byte repack; same values as the per-row
    python reduction."""
    a = np.asarray(a)
    flat = a.reshape(-1, spec.n_limbs)
    if flat.shape[0] >= _BULK_N:
        from ..utils.limbs import limbs_to_ints_fast

        _, from_mont_fn, canon_fn = _bulk_fns(spec)
        digits = (from_mont_fn if mont else canon_fn)(flat)
        return limbs_to_ints_fast(np.asarray(digits))
    out = []
    for row in flat:
        v = limbs_to_int(row) % spec.modulus
        out.append(spec.from_mont_int(v) if mont else v)
    return out
