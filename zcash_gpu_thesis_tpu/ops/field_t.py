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

import functools

import jax
import jax.numpy as jnp
import numpy as np

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
    """[n, P] x [n, P] -> raw [2n, P].  Shift-aware balanced tree of the
    n shifted partial products (no scatter): merging offset-adjacent
    partials keeps intermediate heights near n instead of 2n, so the add
    rows drop ~45% vs accumulating every tap into a full-height [2n, P]
    pad-and-add (the round-1 form).  Same sums, same order of magnitude
    bounds: every output limb is the sum of <= n raw products < 2^30."""
    tail_pad = ((0, 0),) * (a.ndim - 1)
    # (array, offset) partial products, sorted by offset
    parts = [(a[i : i + 1] * b, i) for i in range(n)]
    while len(parts) > 1:
        nxt = []
        for j in range(0, len(parts) - 1, 2):
            x, ox = parts[j]
            y, oy = parts[j + 1]
            shift = oy - ox
            h = max(x.shape[0], shift + y.shape[0])
            xp = jnp.pad(x, ((0, h - x.shape[0]),) + tail_pad)
            yp = jnp.pad(y, ((shift, h - shift - y.shape[0]),) + tail_pad)
            nxt.append((xp + yp, ox))
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    x, ox = parts[0]
    return jnp.pad(x, ((ox, 2 * n - ox - x.shape[0]),) + tail_pad)


def _conv_const_vpu(a, digits, out_len: int):
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


_T_CACHE: dict = {}


def _toeplitz_stacked(digits, n: int, out_len: int) -> np.ndarray:
    """[2*out_len, n] f32 matrix [T & 127; T >> 7] with T[k, i] =
    digits[k - i] — the transposed-layout Toeplitz for ``T @ a``."""
    key = (np.asarray(digits, np.int32).tobytes(), n, out_len)
    cached = _T_CACHE.get(key)
    if cached is None:
        t = np.zeros((out_len, n), dtype=np.int32)
        for k in range(out_len):
            for i in range(n):
                j = k - i
                if 0 <= j < len(digits):
                    t[k, i] = int(digits[j])
        cached = np.concatenate([t & 127, t >> 7], axis=0).astype(
            np.float32
        )
        _T_CACHE[key] = cached
    return cached


def _apply_conv_mxu(a, w, out_len: int):
    """Apply a stacked [2*out_len, n] split-Toeplitz matrix (see
    ``_toeplitz_stacked``) to limbs ``a`` [n, P] as two exact MXU matmuls.

    Both the Toeplitz constant (12-bit digits) and the limbs (<= 2^13
    after rippling) split into 7-bit halves, so every matmul input is an
    integer <= 127 — exact in bf16 — and every accumulated partial sum is
    <= 33 * 127^2 < 2^20 — exact in the MXU's f32 accumulator at DEFAULT
    (single-pass bf16) precision.  Recombination with <<7 / <<14 happens
    in int32.  Bit-identical to ``_conv_const_vpu``; same mathematics as
    field._conv_const_mxu but transposed and in bf16 (Mosaic's integer
    matmul support is generation-dependent; its f32 dot is proven here
    by the bucket kernel's lane-broadcast matmul).
    """
    tail = a.shape[1:]
    if a.ndim > 2:
        # contract over the limb axis regardless of trailing batch dims
        # (jnp.dot would contract the wrong axis of a >2D operand); the
        # flatten/unflatten touch only major axes — free relayouts
        a = a.reshape(a.shape[0], -1)
    a_lo = (a & 127).astype(jnp.float32)
    a_hi = (a >> 7).astype(jnp.float32)
    dot = functools.partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    lo = dot(w, a_lo)  # [T_lo @ a_lo ; T_hi @ a_lo]
    hi = dot(w, a_hi)  # [T_lo @ a_hi ; T_hi @ a_hi]
    ll = lo[:out_len].astype(jnp.int32)
    hl = lo[out_len:].astype(jnp.int32)
    lh = hi[:out_len].astype(jnp.int32)
    hh = hi[out_len:].astype(jnp.int32)
    out = ll + ((hl + lh) << 7) + (hh << 14)
    if tail != out.shape[1:]:
        out = out.reshape((out_len,) + tail)
    return out


def redc_tables(spec: FieldSpec):
    """Host numpy (w_nprime, w_p) stacked split-Toeplitz matrices for the
    two REDC convolutions — pass these into a Pallas kernel as inputs
    (captured jnp constants are rejected by pallas_call) and hand the
    traced refs to ``mont_mul``/``mont_mul_acc`` via ``tables=``."""
    L = spec.n_limbs
    return (
        _toeplitz_stacked(spec.nprime_digits, L, L),
        _toeplitz_stacked(spec.p_digits, L, 2 * L),
    )


def _conv_const(a, digits, out_len: int):
    from ..config import pallas_redc_mxu

    if pallas_redc_mxu():
        n = a.shape[0]
        w = jnp.asarray(_toeplitz_stacked(digits, n, out_len))
        return _apply_conv_mxu(a, w, out_len)
    return _conv_const_vpu(a, digits, out_len)


def _redc(spec: FieldSpec, t, tables=None):
    """Shared Montgomery reduction tail: ``t`` is a [2L, P] product array
    with limbs already rippled to ~12 bits (same class as the single-
    product path feeds it).  ``tables`` (from ``redc_tables``, as traced
    kernel inputs) routes the two constant convolutions through the MXU
    even inside a Pallas kernel."""
    L = spec.n_limbs
    # m needs only two ripple rounds: raw const-conv limbs are < 2^31, so
    # two rounds bring them to <= 2^12 + 2^7 < 2^13 — value-exact under
    # the final mask (at most one overflow bit per limb) and inside the
    # < 2^14 bound the 7-bit MXU splits need.  s keeps three rounds to
    # restore the standing <= 2^12+2 limb invariant; its low-half
    # zero-test is round-count independent (rippling preserves "low value
    # in {0, R}" — each carry escaping into limb L subtracts exactly R).
    if tables is not None:
        w_np, w_p = tables
        m = _ripple_mod(_apply_conv_mxu(t[:L], w_np, L), 2)
        s = _ripple(_apply_conv_mxu(m, w_p, 2 * L) + t, 3)
    else:
        m = _ripple_mod(_conv_const(t[:L], spec.nprime_digits, L), 2)
        s = _ripple(_conv_const(m, spec.p_digits, 2 * L) + t, 3)
    carry = jnp.any(s[:L] != 0, axis=0, keepdims=True).astype(jnp.int32)
    out = s[L:]
    return jnp.concatenate([out[:1] + carry, out[1:]], axis=0)


def mont_mul(spec: FieldSpec, a, b, tables=None):
    # Two ripple rounds suffice pre-REDC: raw conv limbs < 2^30 -> two
    # rounds give <= 2^12 + 2^6, inside the < 2^14 bound the REDC's 7-bit
    # MXU splits need (and < 2^30 products downstream in s = m*p + t).
    return _redc(spec, _ripple(_conv(a, b, spec.n_limbs), 2), tables)


def mont_mul_acc(spec: FieldSpec, pairs, tables=None):
    """REDC(sum of products) — one shared reduction for up to 4 products.

    ``pairs`` is a sequence of (x, y) limb arrays; all products are added
    (negate one operand with ``neg`` for subtraction — its K*p offset
    keeps every term non-negative).  REDC is linear in t modulo p, so a
    single m/s pass reduces the whole sum; this saves a full reduction
    (two 33-tap constant convolutions + ripples) per extra product — the
    dominant cost in the curve formulas' a*b ± c*d terms.

    Overflow audit (int32 lanes): each raw product limb <= 33*LMAX^2 <
    2^29.1, so a PAIR of raw products sums to < 2^30.1 — still exact in
    int32.  Two raw products + two ripple rounds give limbs <= MASK+2^7;
    for 3-4 products, pair-sums take one round each (limbs <= MASK+2^18.1,
    so the sum of two rippled pair-sums < 2^19.2) and one final round
    settles limbs <= MASK + 2^8 — inside the < 2^14 REDC-split bound
    either way."""
    L = spec.n_limbs
    convs = [_conv(x, y, L) for x, y in pairs]
    if len(convs) == 1:
        return _redc(spec, _ripple(convs[0], 2), tables)
    if len(convs) == 2:
        return _redc(spec, _ripple(convs[0] + convs[1], 2), tables)
    # 3-4 products: raw pair sums, one ripple round each, sum, one round
    sums = [convs[i] + convs[i + 1] if i + 1 < len(convs) else convs[i]
            for i in range(0, len(convs), 2)]
    t = sum(_ripple(s, 1) for s in sums)
    return _redc(spec, _ripple(t, 1), tables)


def mont_square(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def select(mask, a, b):
    """mask [1, lanes] (or broadcastable) selecting whole field elements."""
    return jnp.where(mask, a, b)
