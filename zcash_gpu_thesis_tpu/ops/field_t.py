"""Transposed (limb-first) lazy field arithmetic for Pallas kernels.

Same mathematics as ``ops.field`` (12-bit limbs, carry-free convolution,
3-round ripple, full REDC, lazy fold) but with the limb axis LEADING:
arrays are ``[L, lanes]`` so the batch sits on the TPU lane dimension and
limb shifts become sublane slices.  Written in Mosaic-friendly style:
every intermediate stays 2D, constants appear only as python scalars,
and accumulations use pad-and-add (no scatter, no lane reshapes).

Bit-identical to ``ops.field`` up to transposition (tested).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import LIMB_BITS
from .field import LMAX, MASK, FieldSpec


def _ripple(x, rounds: int):
    for _ in range(rounds):
        carry = jnp.concatenate(
            [jnp.zeros_like(x[:1]), (x >> LIMB_BITS)[:-1]], axis=0
        )
        x = (x & MASK) + carry
    return x


def _ripple_mod(x, rounds: int):
    x = _ripple(x, rounds)
    return jnp.concatenate([x[:-1], x[-1:] & MASK], axis=0)


def _fold(spec: FieldSpec, x):
    F, L = spec.fold, spec.n_limbs
    top = x[F : F + 1]
    for k in range(F + 1, L):
        top = top + (x[k : k + 1] << (LIMB_BITS * (k - F)))
    delta = spec.delta_digits
    rows = [x[k : k + 1] + int(delta[k]) * top for k in range(F)]
    rows.append(jnp.zeros_like(top))
    for _ in range(F + 1, L):
        rows.append(jnp.zeros_like(top))
    return jnp.concatenate(rows, axis=0)


def _normalize(spec: FieldSpec, x):
    return _ripple(_fold(spec, _ripple(x, 1)), 2)


def _sub_const_rows(spec: FieldSpec, x):
    """rows_k = sub_digits[k] - x[k] from scalar literals (2D slices)."""
    m = spec.sub_digits
    return jnp.concatenate(
        [int(m[k]) - x[k : k + 1] for k in range(x.shape[0])], axis=0
    )


def add(spec: FieldSpec, a, b):
    return _normalize(spec, a + b)


def sub(spec: FieldSpec, a, b):
    return _normalize(spec, a + _sub_const_rows(spec, b))


def neg(spec: FieldSpec, a):
    return _normalize(spec, _sub_const_rows(spec, a))


def double(spec: FieldSpec, a):
    return add(spec, a, a)


def mul_small(spec: FieldSpec, a, k: int):
    assert 0 <= k <= 20
    if k == 0:
        return jnp.zeros_like(a)
    if k == 1:
        return a
    x = _ripple(_fold(spec, _ripple(a * k, 1)), 1)
    if k > 3:
        x = _fold(spec, x)
    return _ripple(x, 2)


def _conv(a, b, n):
    """[n, P] x [n, P] -> raw [2n, P].  Pad-and-add (no scatter)."""
    acc = jnp.zeros((2 * n,) + a.shape[1:], dtype=jnp.int32)
    tail_pad = ((0, 0),) * (a.ndim - 1)
    for i in range(n):
        acc = acc + jnp.pad(a[i : i + 1] * b, ((i, n - i),) + tail_pad)
    return acc


def _conv_const(a, digits, out_len: int):
    acc = jnp.zeros((out_len,) + a.shape[1:], dtype=jnp.int32)
    n = a.shape[0]
    tail_pad = ((0, 0),) * (a.ndim - 1)
    for j, d in enumerate(digits):
        d = int(d)
        if d == 0 or j >= out_len:
            continue
        width = min(n, out_len - j)
        acc = acc + jnp.pad(
            d * a[:width], ((j, out_len - j - width),) + tail_pad
        )
    return acc


def _redc(spec: FieldSpec, t):
    """Shared Montgomery reduction tail: ``t`` is a [2L, P] product array
    with limbs already rippled to ~12 bits (same class as the single-
    product path feeds it)."""
    L = spec.n_limbs
    m = _ripple_mod(_conv_const(t[:L], spec.nprime_digits, L), 3)
    s = _ripple(_conv_const(m, spec.p_digits, 2 * L) + t, 3)
    carry = jnp.any(s[:L] != 0, axis=0, keepdims=True).astype(jnp.int32)
    out = s[L:]
    return jnp.concatenate([out[:1] + carry, out[1:]], axis=0)


def mont_mul(spec: FieldSpec, a, b):
    return _redc(spec, _ripple(_conv(a, b, spec.n_limbs), 3))


def mont_mul_acc(spec: FieldSpec, pairs):
    """REDC(sum of products) — one shared reduction for up to 4 products.

    ``pairs`` is a sequence of (x, y) limb arrays; all products are added
    (negate one operand with ``neg`` for subtraction — its K*p offset
    keeps every term non-negative).  REDC is linear in t modulo p, so a
    single m/s pass reduces the whole sum; this saves a full reduction
    (two 33-tap constant convolutions + ripples) per extra product — the
    dominant cost in the curve formulas' a*b ± c*d terms.

    Overflow audit (int32 lanes): each raw product limb <= 33*LMAX^2 ~
    2^30; after one ripple round <= MASK + 2^18; the sum of 4 such <=
    2^20.3; two more ripple rounds bring limbs to <= MASK + 1, the same
    class ``_redc`` sees from the single-product path."""
    t = None
    L = spec.n_limbs
    for x, y in pairs:
        p = _ripple(_conv(x, y, L), 1)
        t = p if t is None else t + p
    return _redc(spec, _ripple(t, 2))


def mont_square(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def select(mask, a, b):
    """mask [1, lanes] (or broadcastable) selecting whole field elements."""
    return jnp.where(mask, a, b)
