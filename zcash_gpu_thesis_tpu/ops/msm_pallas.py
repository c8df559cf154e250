"""Pallas TPU kernel for the Pippenger bucket accumulation.

The XLA-level MSM (ops.msm) streams the bucket state through HBM on every
scan step — the measured bottleneck.  This kernel keeps the entire bucket
state ``[nb, 3, L, chunks*W]`` resident in VMEM scratch across the whole
point stream (the role the reference's per-thread private bucket registers
played, bls12-381.cl:2819-2827): points are DMA-pipelined in by the grid,
each grid step folds `k_inner` point batches into the buckets with the
transposed lazy-field arithmetic (ops.field_t), and the state is written
out exactly once at the end.

Mosaic constraints shape the design: no lane reshapes (the chunk->lane
broadcast is an exact f32 matmul against a 0/1 expansion matrix on the
MXU), every intermediate 2D, constants as scalars only.

Signed 4-bit digits (8 buckets) keep the state at ~7 MB for 32 chunks x
65 windows.  Digit 0 skips (padding and zero windows).  The suffix sums /
chunk fold / final ladder reuse the XLA/host path in ops.msm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.limbs import int_to_limbs
from . import field as F
from . import field_t as FT
from .curve import Group

FQ = F.FQ


def _madd_t(spec, b3: int, acc, aff):
    """Transposed complete mixed addition (RCB Algorithm 8, a=0), field
    elements [L, lanes].  The P2-at-infinity case is excluded by digit-0
    skipping."""
    x1, y1, z1 = acc
    x2, y2 = aff
    t0 = FT.mont_mul(spec, x1, x2)
    t1 = FT.mont_mul(spec, y1, y2)
    t3 = FT.mont_mul(spec, FT.add(spec, x2, y2), FT.add(spec, x1, y1))
    t3 = FT.sub(spec, t3, FT.add(spec, t0, t1))
    t4 = FT.add(spec, FT.mont_mul(spec, y2, z1), y1)
    y3 = FT.add(spec, FT.mont_mul(spec, x2, z1), x1)
    t0 = FT.add(spec, FT.double(spec, t0), t0)
    t2 = FT.mul_small(spec, z1, b3)
    z3 = FT.add(spec, t1, t2)
    t1 = FT.sub(spec, t1, t2)
    y3 = FT.mul_small(spec, y3, b3)
    x3 = FT.sub(spec, FT.mont_mul(spec, t3, t1), FT.mont_mul(spec, t4, y3))
    y3 = FT.add(spec, FT.mont_mul(spec, t1, z3), FT.mont_mul(spec, y3, t0))
    z3 = FT.add(spec, FT.mont_mul(spec, z3, t4), FT.mont_mul(spec, t0, t3))
    return (x3, y3, z3)


def _kernel(xs_ref, ys_ref, mag_ref, sign_ref, expand_ref, out_ref,
            bx, by, bz, *, spec, k_inner, chunks, w_count, nb, b3, steps):
    g = pl.program_id(0)
    L = spec.n_limbs
    P = chunks * w_count

    @pl.when(g == 0)
    def _init():
        one_digits = int_to_limbs(spec.r, L)
        one = jnp.concatenate(
            [jnp.full((1, P), int(one_digits[k]), jnp.int32) for k in range(L)],
            axis=0,
        )
        for b in range(nb):
            bx[b] = jnp.zeros((L, P), jnp.int32)
            by[b] = one
            bz[b] = jnp.zeros((L, P), jnp.int32)

    expand = expand_ref[...]  # [chunks, P] f32 0/1 block-expansion matrix

    for t in range(k_inner):
        x = xs_ref[0, :, t * chunks : (t + 1) * chunks]  # [L, chunks]
        y = ys_ref[0, :, t * chunks : (t + 1) * chunks]
        mag = mag_ref[0, t : t + 1]    # [1, P]
        sign = sign_ref[0, t : t + 1]  # [1, P]
        # chunk -> (chunk, window) lane broadcast: exact f32 matmul with
        # the one-hot expansion matrix (single 1 per column => exact)
        # HIGHEST precision: the MXU's default bf16 passes would round
        # 13-bit limb values; highest-precision f32 keeps them exact
        xb = jnp.dot(
            x.astype(jnp.float32), expand,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
        yb = jnp.dot(
            y.astype(jnp.float32), expand,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
        yb = FT.select(sign != 0, FT.neg(spec, yb), yb)

        zero = jnp.zeros((L, P), jnp.int32)
        selx, sely, selz = zero, zero, zero
        for b in range(nb):
            hot = mag == b + 1  # [1, P]
            selx = selx + jnp.where(hot, bx[b], 0)
            sely = sely + jnp.where(hot, by[b], 0)
            selz = selz + jnp.where(hot, bz[b], 0)

        nx, ny, nz = _madd_t(spec, b3, (selx, sely, selz), (xb, yb))

        for b in range(nb):
            hot = mag == b + 1
            bx[b] = jnp.where(hot, nx, bx[b])
            by[b] = jnp.where(hot, ny, by[b])
            bz[b] = jnp.where(hot, nz, bz[b])

    @pl.when(g == steps - 1)
    def _emit():
        for b in range(nb):
            out_ref[0, b] = bx[b]
            out_ref[1, b] = by[b]
            out_ref[2, b] = bz[b]


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def bucket_accumulate(points, digits, c: int = 4, chunks: int = 32,
                      k_inner: int = 4):
    """Run the VMEM bucket kernel over signed digits.

    points: G1 affine pytree (x, y, inf) [n, L]; digits: SIGNED [n, W].
    Returns bucket pytree leaves [chunks, W, nb, L] (x, y, z) matching the
    XLA path's layout.
    """
    from .curve import G1
    from .msm import padded_affine

    spec = FQ
    L = spec.n_limbs
    n = digits.shape[0]
    w_count = digits.shape[1]
    nb = 1 << (c - 1)
    grid = chunks * k_inner
    steps = -(-n // grid)
    n_pad = steps * grid
    points = padded_affine(G1, points, n_pad)
    digits = jnp.pad(digits, ((0, n_pad - n), (0, 0)))
    x, y, inf = points

    # digit 0 for padded/infinity points
    digits = jnp.where(inf[:, None], 0, digits)
    mag = jnp.abs(digits)
    sign = (digits < 0).astype(jnp.int32)

    # [steps, L, k*chunks] transposed coordinate streams
    def arrange_coord(leaf):
        a = leaf.reshape(steps, k_inner * chunks, L)
        return jnp.transpose(a, (0, 2, 1))

    xs_t = arrange_coord(x)
    ys_t = arrange_coord(y)
    # [steps, k, chunks*W] digit planes (chunk-major within a plane)
    P = chunks * w_count
    mags = mag.reshape(steps, k_inner, chunks, w_count).reshape(
        steps, k_inner, P
    )
    signs = sign.reshape(steps, k_inner, chunks, w_count).reshape(
        steps, k_inner, P
    )

    # 0/1 expansion: expand[c, c*W + w] = 1
    expand = np.zeros((chunks, P), dtype=np.float32)
    for ci in range(chunks):
        expand[ci, ci * w_count : (ci + 1) * w_count] = 1.0
    expand = jnp.asarray(expand)

    kernel = functools.partial(
        _kernel, spec=spec, k_inner=k_inner, chunks=chunks,
        w_count=w_count, nb=nb, b3=12, steps=steps,
    )
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, L, k_inner * chunks), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, k_inner * chunks), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_inner, P), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_inner, P), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunks, P), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, nb, L, P), lambda g: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, nb, L, P), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((nb, L, P), jnp.int32),
            pltpu.VMEM((nb, L, P), jnp.int32),
            pltpu.VMEM((nb, L, P), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xs_t, ys_t, mags, signs, expand)

    # [3, nb, L, P] -> leaves [chunks, W, nb, L]
    def untangle(coord):
        a = out[coord].reshape(nb, L, chunks, w_count)
        return jnp.transpose(a, (2, 3, 0, 1))

    return (untangle(0), untangle(1), untangle(2))


def window_sums_pallas(group: Group, points, digits, c: int = 4,
                       chunks: int = 32, k_inner: int = 4):
    """[W] projective window sums via the VMEM bucket kernel (G1 only)."""
    from .msm import _tree_map

    buckets = bucket_accumulate(points, digits, c, chunks, k_inner)
    w_count = digits.shape[1]
    nb = 1 << (c - 1)

    def suffix(carry, bucket_b):
        running, tot = carry
        running = group.add(running, bucket_b)
        tot = group.add(tot, running)
        return (running, tot), None

    buckets_rev = _tree_map(lambda l: jnp.moveaxis(l, 2, 0)[::-1], buckets)
    ident2 = group.identity((chunks, w_count))
    (_, total), _ = jax.lax.scan(suffix, (ident2, ident2), buckets_rev)

    m = chunks
    while m > 1:
        half = m // 2
        lo = _tree_map(lambda l: l[:half], total)
        hi = _tree_map(lambda l: l[half:], total)
        total = group.add(lo, hi)
        m = half
    return _tree_map(lambda l: l[0], total)


_window_sums_pallas_jit = jax.jit(
    window_sums_pallas, static_argnums=(0, 3, 4, 5)
)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def window_sums_affine_pallas(group: Group, points, digits, c: int,
                              chunks: int, k_inner: int):
    return group.to_affine(
        window_sums_pallas(group, points, digits, c, chunks, k_inner)
    )


def _projective_to_ints(group: Group, proj):
    """[W] projective pytree -> host affine int points (inversion in
    python ints — 65 tiny inversions beat a device Fermat scan)."""
    import numpy as np

    from ..constants import Q, modinv
    from . import field as Ff

    xs = Ff.batch_from_limbs(Ff.FQ, np.asarray(proj[0]))
    ys = Ff.batch_from_limbs(Ff.FQ, np.asarray(proj[1]))
    zs = Ff.batch_from_limbs(Ff.FQ, np.asarray(proj[2]))
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zi = modinv(z, Q)
            out.append((x * zi % Q, y * zi % Q))
    return out


def msm_host_pallas(group: Group, points, digits, c: int = 4,
                    chunks: int = 32, k_inner: int = 4):
    """Full MSM: VMEM bucket kernel + host doubling-ladder combine.
    `digits` must be SIGNED (ops.msm.recode_signed)."""
    from ..oracle import curve as O
    from . import curve as cv

    proj = _window_sums_pallas_jit(group, points, digits, c, chunks, k_inner)
    wsums = _projective_to_ints(group, proj)
    acc = None
    for wsum in reversed(wsums):
        for _ in range(c):
            acc = O.g1_add(acc, acc)
        acc = O.g1_add(acc, wsum)
    return acc
