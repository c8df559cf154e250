"""Pallas TPU kernels for the Pippenger bucket accumulation (G1 and G2).

The XLA-level MSM (ops.msm) streams the bucket state through HBM on every
scan step — the measured bottleneck.  These kernels keep the entire bucket
state resident in VMEM scratch across the whole point stream (the role the
reference's per-thread private bucket registers played,
bls12-381.cl:2819-2827): points are DMA-pipelined in by the grid, each
grid step folds `k_inner` point batches into the buckets with the
transposed lazy-field arithmetic (ops.field_t), and the state is written
out exactly once at the end.

Field genericity: the kernel body is written against a tiny adapter
(`_Ft` for Fq, `_Ft2` for Fq2/Karatsuba) whose elements are single
``[nc*L, lanes]`` arrays — Fq2 stacks its two components along the
(sublane) limb axis, so the same kernel text serves G1 and G2 with the
component split hidden inside the adapter.

Mosaic constraints shape the design: no lane reshapes (the chunk->lane
broadcast is an exact f32 matmul against a 0/1 expansion matrix on the
MXU), every intermediate 2D, constants as scalars only.

Signed 4-bit digits (8 buckets) keep the state small (G1 ~3 MB, G2 ~7 MB
for 16 chunks x 65 windows).  Digit 0 skips (padding and zero windows).
The suffix sums / chunk fold / final ladder reuse the XLA/host path in
ops.msm.
"""

from __future__ import annotations

import contextlib
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


class _Ft:
    """Fq adapter over transposed [L, lanes] arrays (G1 coordinates)."""

    nc = 1

    def __init__(self, spec, b3: int):
        self.spec = spec
        self.b3 = b3
        # traced REDC split-Toeplitz tables (set by the kernel from its
        # input refs; pallas_call rejects captured jnp constants)
        self.tables = None

    def mul(self, a, b):
        return FT.mont_mul(self.spec, a, b, self.tables)

    def add(self, a, b):
        return FT.add(self.spec, a, b)

    def sub(self, a, b):
        return FT.sub(self.spec, a, b)

    def neg(self, a):
        return FT.neg(self.spec, a)

    def double(self, a):
        return FT.double(self.spec, a)

    def mul_b3(self, a):
        return FT.mul_small(self.spec, a, self.b3)

    def mul_pair(self, a, b, c, d):
        """a*b + c*d with one shared REDC (field_t.mont_mul_acc)."""
        return FT.mont_mul_acc(self.spec, [(a, b), (c, d)], self.tables)

    def mul_pair_sub(self, a, b, c, d):
        """a*b - c*d with one shared REDC."""
        return FT.mont_mul_acc(
            self.spec, [(a, b), (FT.neg(self.spec, c), d)], self.tables
        )

    def one_rows(self, lanes: int):
        digits = int_to_limbs(self.spec.r, self.spec.n_limbs)
        return jnp.concatenate(
            [jnp.full((1, lanes), int(d), jnp.int32) for d in digits],
            axis=0,
        )


class _Ft2:
    """Fq2 adapter: an element is ``[2L, lanes]`` with the two components
    stacked on the limb axis.  Multiplication is 3-mul Karatsuba with
    u^2 = -1 (fq2.rs mul_assign); b3 = 12(u+1) on the twist
    (k(u+1)a = (k(a0-a1), k(a0+a1)), ops/fq2.py mul_small_nonresidue)."""

    nc = 2

    def __init__(self, spec, b3: int):
        self.spec = spec
        self.b3 = b3
        self.L = spec.n_limbs
        self.tables = None

    def _s(self, v):
        return v[: self.L], v[self.L :]

    @staticmethod
    def _j(c0, c1):
        return jnp.concatenate([c0, c1], axis=0)

    def _map1(self, fn, a):
        a0, a1 = self._s(a)
        return self._j(fn(a0), fn(a1))

    def _map2(self, fn, a, b):
        a0, a1 = self._s(a)
        b0, b1 = self._s(b)
        return self._j(fn(a0, b0), fn(a1, b1))

    def add(self, a, b):
        return self._map2(lambda x, y: FT.add(self.spec, x, y), a, b)

    def sub(self, a, b):
        return self._map2(lambda x, y: FT.sub(self.spec, x, y), a, b)

    def neg(self, a):
        return self._map1(lambda x: FT.neg(self.spec, x), a)

    def double(self, a):
        return self._map1(lambda x: FT.double(self.spec, x), a)

    def mul(self, a, b):
        sp = self.spec
        a0, a1 = self._s(a)
        b0, b1 = self._s(b)
        if _fq2_schoolbook():
            # 4-product schoolbook with ONE shared REDC per component
            # (same shape as mul_pair): 4 variable convs + 2 REDCs vs
            # Karatsuba's 3 convs + 3 REDCs + extra add/sub traffic —
            # with the REDC const-convs on the MXU the reduction is the
            # cheap half, so fewer REDCs/ripples wins on the VMEM kernel.
            na1 = FT.neg(sp, a1)
            real = FT.mont_mul_acc(sp, [(a0, b0), (na1, b1)], self.tables)
            imag = FT.mont_mul_acc(sp, [(a0, b1), (a1, b0)], self.tables)
            return self._j(real, imag)
        t0 = FT.mont_mul(sp, a0, b0, self.tables)
        t1 = FT.mont_mul(sp, a1, b1, self.tables)
        t2 = FT.mont_mul(
            sp, FT.add(sp, a0, a1), FT.add(sp, b0, b1), self.tables
        )
        return self._j(
            FT.sub(sp, t0, t1), FT.sub(sp, FT.sub(sp, t2, t0), t1)
        )

    def mul_b3(self, a):
        sp = self.spec
        a0, a1 = self._s(a)
        return self._j(
            FT.mul_small(sp, FT.sub(sp, a0, a1), self.b3),
            FT.mul_small(sp, FT.add(sp, a0, a1), self.b3),
        )

    def mul_pair(self, a, b, c, d):
        """Fq2 a*b + c*d: schoolbook components, each a 4-product fused
        REDC (mont_mul_acc) — fewer reductions than two Karatsuba muls."""
        sp = self.spec
        a0, a1 = self._s(a)
        b0, b1 = self._s(b)
        c0, c1 = self._s(c)
        d0, d1 = self._s(d)
        na1 = FT.neg(sp, a1)
        nc1 = FT.neg(sp, c1)
        real = FT.mont_mul_acc(
            sp, [(a0, b0), (na1, b1), (c0, d0), (nc1, d1)], self.tables
        )
        imag = FT.mont_mul_acc(
            sp, [(a0, b1), (a1, b0), (c0, d1), (c1, d0)], self.tables
        )
        return self._j(real, imag)

    def mul_pair_sub(self, a, b, c, d):
        return self.mul_pair(a, b, self.neg(c), d)

    def one_rows(self, lanes: int):
        digits = int_to_limbs(self.spec.r, self.spec.n_limbs)
        one = jnp.concatenate(
            [jnp.full((1, lanes), int(d), jnp.int32) for d in digits],
            axis=0,
        )
        return self._j(one, jnp.zeros_like(one))


def _fq2_schoolbook() -> bool:
    from ..config import fq2_schoolbook

    return fq2_schoolbook()


def _adapter(group: Group):
    if group.f.name == "g2":
        return _Ft2(FQ, 12)
    return _Ft(FQ, 12)


def _madd_t(f, acc, aff):
    """Transposed complete mixed addition (RCB Algorithm 8, a=0), field
    elements [nc*L, lanes].  The P2-at-infinity case is excluded by
    digit-0 skipping.  The three a*b +- c*d output terms use fused
    product pairs (one shared REDC each, field_t.mont_mul_acc) — ~30%
    fewer reduction convolutions than eleven independent muls."""
    x1, y1, z1 = acc
    x2, y2 = aff
    t0 = f.mul(x1, x2)
    t1 = f.mul(y1, y2)
    t3 = f.mul(f.add(x2, y2), f.add(x1, y1))
    t3 = f.sub(t3, f.add(t0, t1))
    t4 = f.add(f.mul(y2, z1), y1)
    y3 = f.add(f.mul(x2, z1), x1)
    t0 = f.add(f.double(t0), t0)
    t2 = f.mul_b3(z1)
    z3 = f.add(t1, t2)
    t1 = f.sub(t1, t2)
    y3 = f.mul_b3(y3)
    x3 = f.mul_pair_sub(t3, t1, t4, y3)
    y3 = f.mul_pair(t1, z3, y3, t0)
    z3 = f.mul_pair(z3, t4, t0, t3)
    return (x3, y3, z3)


def _padd_t(f, p, q):
    """Transposed complete projective addition (RCB Algorithm 7, a=0),
    field elements [nc*L, lanes].  Used by the in-kernel window combine
    (bucket suffix sums / chunk fold / ladder) where both operands are
    projective bucket accumulators."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = f.mul(x1, x2)
    t1 = f.mul(y1, y2)
    t2 = f.mul(z1, z2)
    t3 = f.mul(f.add(x1, y1), f.add(x2, y2))
    t3 = f.sub(t3, f.add(t0, t1))
    t4 = f.mul(f.add(y1, z1), f.add(y2, z2))
    t4 = f.sub(t4, f.add(t1, t2))
    ty = f.mul(f.add(x1, z1), f.add(x2, z2))
    ty = f.sub(ty, f.add(t0, t2))
    t0 = f.add(f.double(t0), t0)
    t2 = f.mul_b3(t2)
    z3 = f.add(t1, t2)
    t1 = f.sub(t1, t2)
    ty = f.mul_b3(ty)
    x3 = f.mul_pair_sub(t3, t1, t4, ty)
    y3 = f.mul_pair(t1, z3, ty, t0)
    z3 = f.mul_pair(z3, t4, t0, t3)
    return (x3, y3, z3)


def _pdbl_t(f, p):
    """Transposed complete doubling (RCB Algorithm 9, a=0)."""
    x, y, z = p
    t0 = f.mul(y, y)
    z3 = f.double(f.double(f.double(t0)))
    t1 = f.mul(y, z)
    t2 = f.mul_b3(f.mul(z, z))
    x3 = f.mul(t2, z3)
    y3 = f.add(t0, t2)
    z3 = f.mul(t1, z3)
    t2 = f.add(f.double(t2), t2)
    t0 = f.sub(t0, t2)
    y3 = f.add(f.mul(t0, y3), x3)
    x3 = f.double(f.mul(t0, f.mul(x, y)))
    return (x3, y3, z3)


# Micro-bench probe hook (scripts/kbench.py): "noselect" replaces the
# one-hot bucket gather/scatter with bucket-0 accumulation (wrong math,
# isolates the select cost) INSIDE the real kernel — probes must never
# fork the kernel body or they silently drift.  The flag is read at
# TRACE time, so it may only be flipped through :func:`probe_mode`,
# which clears the production jit caches on both edges — a stale flag
# against a cached executable silently corrupts results.
PROBE_MODE = None


@contextlib.contextmanager
def probe_mode(mode: str):
    global PROBE_MODE
    bucket_state.clear_cache()
    bucket_accumulate.clear_cache()
    PROBE_MODE = mode
    try:
        yield
    finally:
        PROBE_MODE = None
        bucket_state.clear_cache()
        bucket_accumulate.clear_cache()


def _kernel(xs_ref, ys_ref, mag_ref, sign_ref, expand_ref, wnp_ref,
            wp_ref, *rest, f, k_inner, chunks, w_count,
            nb, steps, redc_mxu, has_init):
    if has_init:
        init_ref, out_ref, bx, by, bz = rest
    else:
        init_ref = None
        out_ref, bx, by, bz = rest
    g = pl.program_id(0)
    rows = f.nc * FQ.n_limbs
    P = chunks * w_count
    # REDC const-convs ride the MXU: hand the split-Toeplitz inputs to
    # the field adapter as traced values (see field_t.redc_tables)
    f.tables = (wnp_ref[...], wp_ref[...]) if redc_mxu else None

    @pl.when(g == 0)
    def _init():
        if has_init:
            # resume from a prior slice's bucket state (the 2^20..2^24
            # sliced sweep accumulates into ONE state instead of adding
            # [W] window sums per slice)
            bx[...] = init_ref[0]
            by[...] = init_ref[1]
            bz[...] = init_ref[2]
        else:
            one = f.one_rows(P)
            bx[...] = jnp.zeros((nb, rows, P), jnp.int32)
            by[...] = jnp.broadcast_to(one[None], (nb, rows, P))
            bz[...] = jnp.zeros((nb, rows, P), jnp.int32)

    expand = expand_ref[...]  # [chunks, P] f32 0/1 block-expansion matrix

    # The inner point loop is a lax.fori_loop, not a Python unroll: the
    # loop index only touches LEADING (untiled) block dims, so Mosaic
    # traces the madd body once — the unrolled form made the Fq2 kernel's
    # compile ~1h per grid size (axon tunnel), the single biggest
    # operational cost of round 1.
    def _body(t, carry):
        x = xs_ref[0, t]  # [rows, chunks]
        y = ys_ref[0, t]
        mag = mag_ref[0, t]    # [1, P]
        sign = sign_ref[0, t]  # [1, P]
        # chunk -> (chunk, window) lane broadcast: exact matmul with the
        # one-hot expansion matrix (single 1 per column => exact).  The
        # 13-bit limbs split into 7-bit halves so each dot is a DEFAULT
        # single-pass bf16 matmul (values <= 127 are bf16-exact); this
        # replaced one HIGHEST-precision f32 dot (~6 MXU passes) with
        # two 1-pass dots per coordinate.
        def bcast(v):
            dot = functools.partial(
                jnp.dot, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            lo = dot((v & 127).astype(jnp.float32), expand)
            hi = dot((v >> 7).astype(jnp.float32), expand)
            return lo.astype(jnp.int32) + (hi.astype(jnp.int32) << 7)

        xb = bcast(x)
        yb = bcast(y)
        yb = FT.select(sign != 0, f.neg(yb), yb)

        if PROBE_MODE == "noselect":  # kbench: select cost isolated out
            nx, ny, nz = _madd_t(f, (bx[0], by[0], bz[0]), (xb, yb))
            bx[0], by[0], bz[0] = nx, ny, nz
            return carry

        # one-hot bucket gather/scatter: mask against a bucket-id iota and
        # reduce/select over the whole [nb, rows, P] state in single
        # full-array ops (loop-free even at nb = 128 for c = 8)
        ids = jax.lax.broadcasted_iota(jnp.int32, (nb, 1, P), 0) + 1
        hot = mag[None] == ids  # [nb, 1, P]
        selx = jnp.sum(jnp.where(hot, bx[...], 0), axis=0)
        sely = jnp.sum(jnp.where(hot, by[...], 0), axis=0)
        selz = jnp.sum(jnp.where(hot, bz[...], 0), axis=0)

        nx, ny, nz = _madd_t(f, (selx, sely, selz), (xb, yb))

        bx[...] = jnp.where(hot, nx[None], bx[...])
        by[...] = jnp.where(hot, ny[None], by[...])
        bz[...] = jnp.where(hot, nz[None], bz[...])
        return carry

    jax.lax.fori_loop(0, k_inner, _body, 0)

    @pl.when(g == steps - 1)
    def _emit():
        out_ref[0] = bx[...]
        out_ref[1] = by[...]
        out_ref[2] = bz[...]


def _coord_rows(leaf_or_pair):
    """Affine coordinate pytree leaf(s) [n, L] -> joined [n, nc*L]."""
    if isinstance(leaf_or_pair, tuple):
        return jnp.concatenate(leaf_or_pair, axis=-1)
    return leaf_or_pair


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def bucket_state(group: Group, points, digits, c: int = 4,
                 chunks: int = 32, k_inner: int = 4, init=None):
    """Run the VMEM bucket kernel over signed digits.

    points: affine pytree (x, y, inf) with [n, L] leaves (G1) or
    ((c0, c1), ...) pairs (G2); digits: SIGNED [n, W].  Returns the raw
    bucket state [3, nb, nc*L, chunks*W] (coordinate, bucket-1, limb
    rows, chunk-major lanes).  ``init`` resumes from a prior state — the
    sliced large-n path chains slices through one state instead of
    combining per-slice window sums.
    """
    from .msm import padded_affine

    f = _adapter(group)
    L = FQ.n_limbs
    rows = f.nc * L
    n = digits.shape[0]
    w_count = digits.shape[1]
    nb = 1 << (c - 1)
    grid = chunks * k_inner
    steps = -(-n // grid)
    n_pad = steps * grid
    points = padded_affine(group, points, n_pad)
    digits = jnp.pad(digits, ((0, n_pad - n), (0, 0)))
    # accept narrow upload dtypes (int16 limbs / int8 digits halve the
    # host->device transfer for 2^20..2^24 streams); widen on device
    digits = digits.astype(jnp.int32)
    x, y, inf = points
    x = _coord_rows(x).astype(jnp.int32)
    y = _coord_rows(y).astype(jnp.int32)

    # digit 0 for padded/infinity points
    digits = jnp.where(inf[:, None], 0, digits)
    mag = jnp.abs(digits)
    sign = (digits < 0).astype(jnp.int32)

    # [steps, k, rows, chunks] transposed coordinate streams (the inner
    # loop indexes t on the leading untiled dims only)
    def arrange_coord(leaf):
        a = leaf.reshape(steps, k_inner, chunks, rows)
        return jnp.transpose(a, (0, 1, 3, 2))

    xs_t = arrange_coord(x)
    ys_t = arrange_coord(y)
    # [steps, k, 1, chunks*W] digit planes (chunk-major within a plane)
    P = chunks * w_count
    mags = mag.reshape(steps, k_inner, chunks, w_count).reshape(
        steps, k_inner, 1, P
    )
    signs = sign.reshape(steps, k_inner, chunks, w_count).reshape(
        steps, k_inner, 1, P
    )

    # 0/1 expansion: expand[c, c*W + w] = 1
    expand = np.zeros((chunks, P), dtype=np.float32)
    for ci in range(chunks):
        expand[ci, ci * w_count : (ci + 1) * w_count] = 1.0
    expand = jnp.asarray(expand)

    from ..config import pallas_redc_mxu

    w_np, w_p = FT.redc_tables(FQ)
    kernel = functools.partial(
        _kernel, f=f, k_inner=k_inner, chunks=chunks,
        w_count=w_count, nb=nb, steps=steps,
        redc_mxu=pallas_redc_mxu(), has_init=init is not None,
    )
    in_specs = [
        pl.BlockSpec((1, k_inner, rows, chunks),
                     lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k_inner, rows, chunks),
                     lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k_inner, 1, P), lambda g: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k_inner, 1, P), lambda g: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunks, P), lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w_np.shape, lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w_p.shape, lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xs_t, ys_t, mags, signs, expand, jnp.asarray(w_np),
            jnp.asarray(w_p)]
    if init is not None:
        in_specs.append(
            pl.BlockSpec((3, nb, rows, P), lambda g: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(init)
    return pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, nb, rows, P), lambda g: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, nb, rows, P), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((nb, rows, P), jnp.int32),
            pltpu.VMEM((nb, rows, P), jnp.int32),
            pltpu.VMEM((nb, rows, P), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            # Raising this does NOT fix large-state OOMs: Mosaic's
            # scoped-stack demand tracks the budget (102.4M needed at a
            # 100M limit became 113M at 112M).  The G2 chained-state
            # form instead caps its window-lane width (engine clamps
            # lo_w <= 32 for c=7 G2 when slicing) so the state fits.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def bucket_accumulate(group: Group, points, digits, c: int = 4,
                      chunks: int = 32, k_inner: int = 4):
    """Bucket state as coordinate pytrees [chunks, W, nb, L] (the XLA
    path's layout, consumed by the XLA suffix-sum path and tests)."""
    f = _adapter(group)
    L = FQ.n_limbs
    w_count = digits.shape[1]
    nb = 1 << (c - 1)
    out = bucket_state(group, points, digits, c, chunks, k_inner)

    def untangle(coord):
        def comp(c0):
            a = out[coord, :, c0 * L : (c0 + 1) * L].reshape(
                nb, L, chunks, w_count
            )
            return jnp.transpose(a, (2, 3, 0, 1))

        if f.nc == 1:
            return comp(0)
        return (comp(0), comp(1))

    return (untangle(0), untangle(1), untangle(2))


def _combine_kernel(state_ref, wnp_ref, wp_ref, out_ref, *, f, c,
                    chunks, w_count, nb, redc_mxu):
    """Suffix sums over buckets + chunk fold + window doubling ladder,
    entirely in VMEM — replaces the XLA-level scan/fold/ladder tail that
    cost ~130 ms of serial small-kernel dispatches per MSM (measured;
    this kernel runs in ~1-2 ms).  Output: ONE packed projective point
    [3, rows, 128] (lane 0 carries the value)."""
    rows = f.nc * FQ.n_limbs
    P = chunks * w_count
    f.tables = (wnp_ref[...], wp_ref[...]) if redc_mxu else None

    one = f.one_rows(P)
    zero = jnp.zeros((rows, P), jnp.int32)
    ident = (zero, one, zero)

    def suffix_body(b, carry):
        running, tot = carry
        idx = nb - 1 - b
        bucket = (state_ref[0, idx], state_ref[1, idx], state_ref[2, idx])
        running = _padd_t(f, running, bucket)
        tot = _padd_t(f, tot, running)
        return (running, tot)

    _, tot = jax.lax.fori_loop(0, nb, suffix_body, (ident, ident))

    # Chunk fold.  Lane-offset slices of the chunk-major [rows, P] state
    # produce layouts Mosaic cannot re-concatenate (offset vregs inside
    # the ripple concats), so each chunk's [rows, w_count] block is
    # extracted into an ALIGNED 64-lane array via an exact one-hot f32
    # matmul (single 1 per column, values <= 2^13 — exact at HIGHEST),
    # then the chunks tree-fold with projective adds.  Pad lanes
    # (>= w_count) carry all-zero garbage that never feeds valid lanes
    # (bounded: zero limbs stay zero through muls).
    w_pad = -(-w_count // 64) * 64
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (P, w_pad), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (P, w_pad), 1)

    def extract(ci):
        e = jnp.logical_and(
            lane_i == col_i + ci * w_count, col_i < w_count
        ).astype(jnp.float32)
        return tuple(
            jnp.dot(t.astype(jnp.float32), e,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
            for t in tot)

    blocks = [extract(ci) for ci in range(chunks)]
    while len(blocks) > 1:
        nxt = [_padd_t(f, blocks[i], blocks[i + 1])
               for i in range(0, len(blocks) - 1, 2)]
        if len(blocks) % 2:
            nxt.append(blocks[-1])
        blocks = nxt
    tot = blocks[0]  # [rows, w_pad], windows 0..w_count-1 valid

    # Horner ladder over the window sums, highest window first:
    # acc = 2^c * acc + S_w.  Column extraction rides the MXU via a
    # one-hot [w_pad, 1] f32 matmul.
    onec = f.one_rows(1)
    zero1 = jnp.zeros((rows, 1), jnp.int32)
    ident1 = (zero1, onec, zero1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (w_pad, 1), 0)

    def ladder_body(i, acc):
        w = w_count - 1 - i
        for _ in range(c):
            acc = _pdbl_t(f, acc)
        hot = (lane_iota == w).astype(jnp.float32)
        col = tuple(
            jnp.dot(t.astype(jnp.float32), hot,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
            for t in tot)
        return _padd_t(f, acc, col)

    acc = jax.lax.fori_loop(0, w_count, ladder_body, ident1)
    out_ref[0] = jnp.broadcast_to(acc[0], (rows, 128))
    out_ref[1] = jnp.broadcast_to(acc[1], (rows, 128))
    out_ref[2] = jnp.broadcast_to(acc[2], (rows, 128))


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def combine_state_pallas(group: Group, state, c: int, chunks: int,
                         w_count: int):
    """Bucket state [3, nb, rows, P] -> packed projective point [3*rows]
    (the _pack_point layout: x rows, y rows, z rows; Fq2 components
    stacked c0-then-c1 within each coordinate)."""
    from ..config import pallas_redc_mxu

    f = _adapter(group)
    rows = f.nc * FQ.n_limbs
    nb = 1 << (c - 1)
    P = chunks * w_count
    w_np, w_p = FT.redc_tables(FQ)
    kernel = functools.partial(
        _combine_kernel, f=f, c=c, chunks=chunks, w_count=w_count,
        nb=nb, redc_mxu=pallas_redc_mxu(),
    )
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((3, nb, rows, P), lambda g: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_np.shape, lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_p.shape, lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, rows, 128), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, rows, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(state, jnp.asarray(w_np), jnp.asarray(w_p))
    return out[:, :, 0].reshape(-1)


def window_sums_pallas(group: Group, points, digits, c: int = 4,
                       chunks: int = 32, k_inner: int = 4):
    """[W] projective window sums via the VMEM bucket kernel."""
    from .msm import _tree_map

    buckets = bucket_accumulate(group, points, digits, c, chunks, k_inner)
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


def _pack_point(proj):
    """Projective pytree (G1 leaves [L] / G2 component tuples) -> ONE flat
    int32 array.  A packed result costs a single host<->device transfer —
    per-leaf readback was 3 (G1) / 6 (G2) serial tunnel round trips, which
    dominated the post-kernel tail at ~35 ms each."""
    return jnp.concatenate(
        [l.reshape(-1) for l in jax.tree.leaves(proj)], axis=0
    )


def _unpack_point(group: Group, flat):
    """Inverse of _pack_point on a host numpy array -> projective pytree
    structure with [L] numpy leaves."""
    L = FQ.n_limbs
    nc = 2 if group.f.name == "g2" else 1
    leaves = [flat[i * L : (i + 1) * L] for i in range(3 * nc)]
    if nc == 1:
        x, y, z = leaves
        return (x, y, z)
    return (
        (leaves[0], leaves[1]),
        (leaves[2], leaves[3]),
        (leaves[4], leaves[5]),
    )


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def msm_pallas_device(group: Group, points, digits, c: int = 4,
                      chunks: int = 32, k_inner: int = 4,
                      slice_n: int = 1 << 20):
    """Whole MSM fused on device: bucket kernel + in-VMEM combine kernel
    (suffix sums, chunk fold, window doubling ladder) — the readback is a
    single PACKED projective point.  The combine runs as a second Pallas
    kernel (~1-2 ms) instead of the XLA scan/ladder tail, whose ~350
    serial small-kernel dispatches cost ~130 ms per MSM (measured on
    v5e)."""
    state = bucket_state(group, points, digits, c, chunks, k_inner)
    return combine_state_pallas(group, state, c, chunks,
                                digits.shape[1])


_combine_windows_jit = None


def _get_combine_windows_jit():
    global _combine_windows_jit
    if _combine_windows_jit is None:
        from .msm import combine_windows

        _combine_windows_jit = jax.jit(
            lambda group, wsums, c: _pack_point(
                combine_windows(group, wsums, c)
            ),
            static_argnums=(0, 2),
        )
    return _combine_windows_jit


def msm_device_proj(group: Group, points, digits, c: int = 4,
                    chunks: int = 32, k_inner: int = 4,
                    slice_n: int = 1 << 20):
    """Whole MSM on device, result left as a PACKED device point
    (_pack_point) — no host readback, so callers can dispatch several
    MSMs back-to-back and sync once with one transfer each (the prover's
    5 MSMs pipeline this way instead of serializing on one tunnel round
    trip per coordinate)."""
    n = digits.shape[0]
    if n <= slice_n:
        return msm_pallas_device(group, points, digits, c, chunks,
                                 k_inner, slice_n)
    # large n: chain the bucket state across fixed-size kernel passes
    # (one compiled executable, bounded HBM residency), combine once
    from .msm import _tree_map, padded_affine

    state = None
    for s in range(0, n, slice_n):
        e = min(s + slice_n, n)
        pts = _tree_map(lambda l: l[s:e], points)
        digs = jnp.asarray(digits[s:e])
        if e - s < slice_n:
            pts = padded_affine(group, pts, slice_n)
            digs = jnp.pad(digs, ((0, slice_n - (e - s)), (0, 0)))
        state = bucket_state(group, pts, digs, c, chunks, k_inner,
                             init=state)
    return combine_state_pallas(group, state, c, chunks, digits.shape[1])


def packed_to_int_point(group: Group, packed):
    """Packed device point -> host affine ints (one device sync)."""
    flat = np.asarray(packed)
    pt = _projective_to_ints(
        group, jax.tree.map(lambda l: l[None], _unpack_point(group, flat))
    )
    return pt[0]


def msm_host_pallas_fused(group: Group, points, digits, c: int = 4,
                          chunks: int = 32, k_inner: int = 4,
                          slice_n: int = 1 << 20):
    """msm_host_pallas with the device-side combine: returns python-int
    affine (None for identity).  Large n still sweeps slices (the slice
    partials stay projective on device; only the final combine runs)."""
    packed = msm_device_proj(group, points, digits, c, chunks, k_inner,
                             slice_n)
    return packed_to_int_point(group, packed)


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

    def leaf_ints(leaf):
        if isinstance(leaf, tuple):
            return list(zip(*(leaf_ints(l) for l in leaf)))
        return Ff.batch_from_limbs(Ff.FQ, np.asarray(leaf))

    xs = leaf_ints(proj[0])
    ys = leaf_ints(proj[1])
    zs = leaf_ints(proj[2])
    g2 = group.f.name == "g2"
    out = []
    for x, y, z in zip(xs, ys, zs):
        if g2:
            from ..oracle import curve as O

            if z == (0, 0):
                out.append(None)
            else:
                zi = O.f2_inv(z)
                out.append((O.f2_mul(x, zi), O.f2_mul(y, zi)))
        else:
            if z == 0:
                out.append(None)
            else:
                zi = modinv(z, Q)
                out.append((x * zi % Q, y * zi % Q))
    return out


@functools.partial(jax.jit, static_argnums=(0,))
def _add_wsums(group: Group, a, b):
    return group.add(a, b)


def window_sums_pallas_sliced(group: Group, points, digits, c: int = 4,
                              chunks: int = 32, k_inner: int = 4,
                              slice_n: int = 1 << 20):
    """[W] projective window sums for arbitrarily large n, as a serial
    sweep of fixed-size kernel launches.

    Window sums are linear in the point stream, so an n-point MSM splits
    into ceil(n / slice_n) independent ``slice_n``-point bucket passes
    whose [W] sums add projectively — one compiled executable (the last
    slice pads with infinity/digit-0, which the kernel skips), bounded
    HBM residency (one slice's transposed streams at a time), and
    host->device upload interleaved with compute.  This is the 2^20..2^24
    path (BASELINE configs 3/5; the reference's 10M-point fixture,
    ec.rs:2527-2552) — the VMEM bucket state is size-independent, only
    the streamed inputs scale.

    ``points`` leaves may be host numpy arrays (sliced lazily, uploaded
    per slice) or device arrays.
    """
    n = digits.shape[0]
    if n <= slice_n:
        return _window_sums_pallas_jit(
            group, points, digits, c, chunks, k_inner
        )
    from .msm import _tree_map, padded_affine

    total = None
    for s in range(0, n, slice_n):
        e = min(s + slice_n, n)
        pts = _tree_map(lambda l: l[s:e], points)
        digs = jnp.asarray(digits[s:e])
        if e - s < slice_n:
            pts = padded_affine(group, pts, slice_n)
            digs = jnp.pad(digs, ((0, slice_n - (e - s)), (0, 0)))
        wsum = _window_sums_pallas_jit(
            group, pts, digs, c, chunks, k_inner
        )
        total = wsum if total is None else _add_wsums(group, total, wsum)
    return total


def msm_host_pallas(group: Group, points, digits, c: int = 4,
                    chunks: int = 32, k_inner: int = 4,
                    slice_n: int = 1 << 20):
    """Full MSM: VMEM bucket kernel + host doubling-ladder combine.
    `digits` must be SIGNED (ops.msm.recode_signed).  Works for G1 and
    G2 (the kernel is field-generic via the adapters); n above `slice_n`
    streams through fixed-size slices (window_sums_pallas_sliced)."""
    from ..oracle import curve as O

    proj = window_sums_pallas_sliced(
        group, points, digits, c, chunks, k_inner, slice_n
    )
    wsums = _projective_to_ints(group, proj)
    g2 = group.f.name == "g2"
    add = O.g2_add if g2 else O.g1_add
    acc = None
    for wsum in reversed(wsums):
        for _ in range(c):
            acc = add(acc, acc)
        acc = add(acc, wsum)
    return acc
