"""Pippenger multi-scalar multiplication over G1/G2, TPU-shaped.

Re-design of the reference's MSM stack (CPU ``multiexp.rs:140-232``, GPU
``affine_mulexp_smart_no_red`` + host reduction ``bls12-381.cl:2845`` /
``multiexp.rs:2946-2986``).  The winning reference decomposition — a 2D
grid of point-chunks x exponent-windows with per-thread private buckets,
suffix-summed and then combined with interleaved doublings — maps here to:

  * scalars are decomposed into W = ceil(255/c) c-bit digits;
  * the accumulation state is ``buckets[chunks, W, 2^c - 1]`` of projective
    points (a pytree of limb arrays), updated by a ``lax.scan`` over point
    batches.  Each scan step handles `k_inner` points per chunk so the
    HBM round-trip of the bucket state amortizes over many adds;
  * the per-point bucket select/update is **one-hot arithmetic**, not
    gather/scatter: ``sel = sum_b onehot_b * bucket_b`` and
    ``buckets = where(onehot, new, buckets)``.  TPU lanes cannot randomly
    address memory; one-hot turns the random access into full-width vector
    ops (the same reason the reference's GPU buckets were *registers*
    indexed by compile-time-unrolled compares);
  * digit 0 selects nothing (the reference skips zero exponents,
    multiexp.rs:176-183) — complete formulas make every other case safe,
    including repeated points (bucket doubling) and infinity padding;
  * per-window bucket suffix sums (sum_b b * bucket_b, the "summation by
    parts" of multiexp.rs:198-207) run batched over [chunks, W];
  * chunks fold by a log2 tree (the GPU's reduction ladder,
    bls12-381.cl:3236), then a scan over windows does the c-doublings-and-
    add combine (multiexp.rs:212-232).

Everything is one jit-able pure function of [n]-batched affine points and
scalar digit arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FR_BITS
from . import curve as cv
from . import field as F
from .curve import G1, G2, Group

FR = F.FR


def scalar_bits() -> int:
    return FR_BITS


def digits_from_canonical(scalars, c: int):
    """[n, L_fr] canonical 12-bit Fr limbs -> [n, W] c-bit digits.

    Digit w covers scalar bits [c*w, c*(w+1)).  Works for any c <= 12 by
    stitching at most two adjacent limbs per digit.
    """
    assert 1 <= c <= 12
    lb = 12
    n_limbs = scalars.shape[-1]
    w_count = -(-FR_BITS // c)
    cols = []
    for w in range(w_count):
        bit = c * w
        l0, s0 = bit // lb, bit % lb
        d = scalars[..., l0] >> s0
        if s0 + c > lb and l0 + 1 < n_limbs:
            d = d | (scalars[..., l0 + 1] << (lb - s0))
        cols.append(d & ((1 << c) - 1))
    return jnp.stack(cols, axis=-1)


def digits_from_ints(xs, c: int) -> np.ndarray:
    """Host helper: python ints -> [n, W] digit array (vectorized via the
    bulk 12-bit limb packer)."""
    from ..utils.limbs import ints_to_limbs_fast

    w_count = -(-FR_BITS // c)
    limbs = ints_to_limbs_fast(xs, 24).astype(np.int64)  # [n, 24] 12-bit
    out = np.zeros((len(xs), w_count), dtype=np.int32)
    for w in range(w_count):
        bit = c * w
        l0, s0 = bit // 12, bit % 12
        d = limbs[:, l0] >> s0
        if s0 + c > 12 and l0 + 1 < 24:
            d |= limbs[:, l0 + 1] << (12 - s0)
        out[:, w] = d & ((1 << c) - 1)
    return out


def digits_from_limbs_np(limbs: np.ndarray, c: int) -> np.ndarray:
    """Host mirror of ``digits_from_canonical``: [n, L] 12-bit canonical
    limb rows (any int dtype) -> [n, W] unsigned c-bit digits.  Used by
    the hybrid window split to build the host digit plane from the same
    int16 limb array the prover uploads — bit-identical to the device
    decomposition."""
    limbs = np.asarray(limbs).astype(np.int64)
    n_limbs = limbs.shape[1]
    w_count = -(-FR_BITS // c)
    out = np.zeros((limbs.shape[0], w_count), dtype=np.int32)
    for w in range(w_count):
        bit = c * w
        l0, s0 = bit // 12, bit % 12
        if l0 >= n_limbs:
            continue
        d = limbs[:, l0] >> s0
        if s0 + c > 12 and l0 + 1 < n_limbs:
            d |= limbs[:, l0 + 1] << (12 - s0)
        out[:, w] = d & ((1 << c) - 1)
    return out


def recode_signed(digits: np.ndarray, c: int) -> np.ndarray:
    """Unsigned c-bit windows -> signed digits in [-(2^(c-1)), 2^(c-1))
    plus one carry window; halves the bucket count (|d| <= 2^(c-1)).

    The reference's GPU kernels used unsigned buckets (15 for 4-bit,
    bls12-381.cl:2819); signed recoding is the standard halving trick —
    bucket traffic is the one-hot path's dominant cost on TPU.
    """
    digits = np.asarray(digits, dtype=np.int32)
    n, w = digits.shape
    out = np.zeros((n, w + 1), dtype=np.int32)
    carry = np.zeros((n,), dtype=np.int32)
    half = 1 << (c - 1)
    full = 1 << c
    for i in range(w):
        d = digits[:, i] + carry
        carry = (d >= half).astype(np.int32)
        out[:, i] = d - carry * full
    out[:, w] = carry
    return out


def recode_signed_dev(digits, c: int):
    """Device-side ``recode_signed``: [n, W] unsigned c-bit digits ->
    [n, W+1] signed digits in [-(2^(c-1)), 2^(c-1)).  The carry chain is
    sequential over windows (W ~ 64 scan steps of [n] int32 vector ops —
    negligible), keeping the whole scalar pipeline on device."""
    half = 1 << (c - 1)
    full = 1 << c

    def body(carry, d):
        d = d + carry
        carry = (d >= half).astype(jnp.int32)
        return carry, d - carry * full

    n = digits.shape[0]
    carry, out = jax.lax.scan(
        body, jnp.zeros((n,), jnp.int32), jnp.moveaxis(digits, 1, 0)
    )
    return jnp.concatenate(
        [jnp.moveaxis(out, 0, 1), carry[:, None]], axis=1
    )


def _tree_map(fn, *trees):
    return jax.tree.map(fn, *trees)


def _bucket_select(onehot, buckets):
    """sum_b onehot[..., b] * buckets[..., b, :] — exact one-hot gather."""
    return _tree_map(
        lambda leaf: jnp.sum(onehot[..., None] * leaf, axis=2), buckets
    )


def _bucket_update(onehot, new, buckets):
    """Write `new` into the hot bucket lane; untouched lanes unchanged."""
    mask = onehot[..., None] != 0
    return _tree_map(
        lambda nleaf, bleaf: jnp.where(mask, nleaf[:, :, None], bleaf),
        new,
        buckets,
    )


def padded_affine(group: Group, aff, n_pad: int):
    """Pad a batched affine pytree with infinity up to n_pad points."""
    x, y, inf = aff
    n = inf.shape[0]
    if n == n_pad:
        return aff
    pad = n_pad - n
    x = _tree_map(lambda l: jnp.pad(l, ((0, pad), (0, 0))), x)
    y = _tree_map(lambda l: jnp.pad(l, ((0, pad), (0, 0))), y)
    inf = jnp.pad(inf, (0, pad), constant_values=True)
    return (x, y, inf)


def window_sums(group: Group, points, digits, c: int = 4, chunks: int = 64,
                k_inner: int = 8, signed: bool = False):
    """Per-window Pippenger partial sums: a [W]-batched projective pytree.

    This is the shard-local body of an MSM; the multi-chip MSM computes
    window sums per device and combines across the mesh (parallel/mesh.py),
    mirroring the reference's work-groups-then-host split
    (bls12-381.cl:2845 + multiexp.rs:2946-2986).

    Args:
      group: cv.G1 or cv.G2.
      points: batched affine pytree (x, y, inf), n points.
      digits: [n, W] int32 c-bit digit array (see digits_from_canonical).
      c: window bit width; W = ceil(255/c) windows.
      chunks: parallel point-chunks (the reference's work-groups).
      k_inner: points per chunk folded into one scan step (amortizes the
        bucket-state HBM round trip).
    """
    assert chunks & (chunks - 1) == 0, "chunks must be a power of two"
    n = digits.shape[0]
    w_count = digits.shape[1]
    # signed digits (recode_signed) use |d| <= 2^(c-1): half the buckets
    nb = (1 << (c - 1)) if signed else (1 << c) - 1

    grid = chunks * k_inner
    steps = -(-n // grid)
    n_pad = steps * grid
    points = padded_affine(group, points, n_pad)
    digits = jnp.pad(digits, ((0, n_pad - n), (0, 0)))

    # Layout: step-major, then inner, then chunk.
    def arrange(leaf):
        return leaf.reshape((steps, k_inner, chunks) + leaf.shape[1:])

    pts = _tree_map(arrange, points)
    digs = digits.reshape(steps, k_inner, chunks, w_count)

    bucket_ids = jnp.arange(1, nb + 1, dtype=jnp.int32)

    def make_buckets():
        ident = group.identity((chunks, w_count, nb))
        return ident

    def step(buckets, inp):
        pts_s, digs_s = inp
        for t in range(k_inner):
            aff_t = _tree_map(lambda l: l[t], pts_s)  # [chunks, ...]
            d_t = digs_s[t]  # [chunks, W]
            if signed:
                mag = jnp.abs(d_t)
                sign = d_t < 0
            else:
                mag = d_t
            onehot = (mag[..., None] == bucket_ids).astype(jnp.int32)
            sel = _bucket_select(onehot, buckets)  # [chunks, W, ...]
            x, y, inf = aff_t
            bx = _tree_map(lambda l: l[:, None], x)
            by = _tree_map(lambda l: l[:, None], y)
            if signed:
                # negative digit: add -P (negate y per (chunk, window) lane)
                by = group.f.select(sign, group.f.neg(by), by)
            binf = jnp.broadcast_to(inf[:, None], d_t.shape)
            new = group.add_mixed(sel, (bx, by, binf))
            buckets = _bucket_update(onehot, new, buckets)
        return buckets, None

    buckets, _ = jax.lax.scan(step, make_buckets(), (pts, digs))

    # Suffix sums: window_sum = sum_b b * bucket_b  (multiexp.rs:198-207),
    # as a scan over the bucket axis from the top bucket down.
    def suffix(carry, bucket_b):
        running, tot = carry
        running = group.add(running, bucket_b)
        tot = group.add(tot, running)
        return (running, tot), None

    buckets_rev = _tree_map(lambda l: jnp.moveaxis(l, 2, 0)[::-1], buckets)
    ident2 = group.identity((chunks, w_count))
    (_, total), _ = jax.lax.scan(suffix, (ident2, ident2), buckets_rev)

    # Fold chunks by halving (reduction ladder, bls12-381.cl:2664-2683).
    m = chunks
    while m > 1:
        half = m // 2
        lo = _tree_map(lambda l: l[:half], total)
        hi = _tree_map(lambda l: l[half:], total)
        total = group.add(lo, hi)
        m = half
    return _tree_map(lambda l: l[0], total)  # [W, ...]


def combine_windows(group: Group, wsums, c: int):
    """acc = 2^c * acc + window_sum[w], w from the top window down
    (multiexp.rs:212-232) — as a scan over reversed windows."""

    def combine(acc, wsum):
        for _ in range(c):
            acc = group.double(acc)
        acc = group.add(acc, wsum)
        return acc, None

    rev = _tree_map(lambda l: l[::-1], wsums)
    acc, _ = jax.lax.scan(combine, group.identity(()), rev)
    return acc


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def msm(group: Group, points, digits, c: int = 4, chunks: int = 64,
        k_inner: int = 8, signed: bool = False):
    """Multi-scalar multiplication sum_i scalar_i * P_i -> one projective
    point (pytree with batch shape ()).  See window_sums for the layout."""
    return combine_windows(
        group, window_sums(group, points, digits, c, chunks, k_inner, signed), c
    )


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def window_sums_affine(group: Group, points, digits, c: int, chunks: int,
                       k_inner: int, signed: bool = False):
    """Device part of the host-combined MSM: [W] affine window sums."""
    return group.to_affine(
        window_sums(group, points, digits, c, chunks, k_inner, signed)
    )


def msm_host(group: Group, points, digits, c: int = 4, chunks: int = 64,
             k_inner: int = 8, signed: bool = False):
    """MSM with the final W-window doubling ladder on the host.

    The ladder is ~255 sequential batch-1 group ops — microseconds of
    python-int math but milliseconds of underutilized TPU dispatch, the
    same reason the reference ran its final reduction on the CPU
    (multiexp.rs:2968-2986).  Returns a python-int affine point (None for
    identity).
    """
    from ..oracle import curve as O

    aff = window_sums_affine(group, points, digits, c, chunks, k_inner, signed)
    if group is G1:
        wsums = cv.g1_affine_to_ints(aff)
        add = O.g1_add
    else:
        wsums = cv.g2_affine_to_ints(aff)
        add = O.g2_add
    acc = None
    for wsum in reversed(wsums):
        for _ in range(c):
            acc = add(acc, acc)
        acc = add(acc, wsum)
    return acc


def msm_from_ints(group: Group, point_ints, scalar_ints, c: int = 4,
                  chunks: int = 8, k_inner: int = 4):
    """Host convenience: python-int points/scalars -> projective result."""
    if group is G1:
        aff = cv.g1_affine_from_ints(point_ints)
    else:
        aff = cv.g2_affine_from_ints(point_ints)
    digits = jnp.asarray(digits_from_ints(scalar_ints, c))
    return msm(group, aff, digits, c, chunks, k_inner)
