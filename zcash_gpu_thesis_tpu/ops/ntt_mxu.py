"""MXU matmul NTT: radix-2^k DFT passes as exact split matmuls.

The radix-2 butterfly NTT (ops.ntt.Domain._fft, the re-design of the
reference's ``serial_fft``, bellman/src/domain.rs:272-315) is VPU-bound and
measured at 4-8% of int32 peak on v5e: every butterfly is a full Montgomery
multiply whose 24x24 limb convolution runs as pad-and-add vector ops with
every intermediate materialized to HBM (measured ~50 ms per pointwise
mont_mul sweep at 2^20).

This module restructures the transform so the multiply work rides the MXU
and the reduction work stays in VMEM:

  * decompose n = r_0 * r_1 * ... (r <= 64) and run one *DFT-by-matmul*
    pass per factor (the four/six-step decomposition — the reference
    analog is ``parallel_fft``'s 2^k interleaved sub-FFTs,
    domain.rs:317-374, which ``parallel.mesh.sharded_ntt`` maps across
    chips; here the same factorization maps onto the MXU);
  * a radix-r DFT along one axis is y[k] = sum_j W[k,j] * x[j]: its limb
    expansion is ONE host-constant matrix applied to the limb-expanded
    input, t[(k,t')] = sum_{j,m} M[(k,t'),(j,m)] * x[(j,m)] with
    M[(k,t'),(j,m)] = limb_{t'-m}(W[k,j]) — a [48r, 24r] constant.
    Operands split 6/7-bit so every product and f32 accumulation is exact
    (<= 63*127*24r < 2^24 for r <= 64; the same bf16-exactness argument
    as field_t._apply_conv_mxu, proven by the MSM bucket kernel);
  * ONE deferred Montgomery reduction per output element per pass (REDC
    is linear in t; t = sum of r products < r*p*2B << R*p keeps the
    full-width REDC valid) — r-fold fewer reductions than per-butterfly;
  * the reduction + inter-pass twiddle run as a Pallas kernel
    (fold + ripple + REDC + twiddle in VMEM, grid over blocks) — the
    XLA form of the same math pays ~10x in HBM round trips;
  * constant scalings FOLD INTO THE MATRICES at zero runtime cost:
      - column scale s^j per pass  == input multiplied by s^i
        (coset_fft's distribute_powers, domain.rs:105),
      - row scale u^k per pass     == output multiplied by u^k
        (icoset_fft's gen_inv powers),
      - scalar const on pass 0     == 1/n, z_inv (divide_by_z_on_coset),
        or R (to re-bias one operand of a pointwise product so an entire
        pipeline runs on CANONICAL-form values with no to_mont/from_mont
        boundary passes — see groth16.engine._h_impl).

Layout is limb-leading [L=24, n] (full lane utilization); twiddle tables
are per-domain device constants passed in as arguments.

Bit-exact vs ops.ntt.Domain._fft (tested: tests/test_ntt.py).
"""

from __future__ import annotations

import contextlib
import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import R as FR_MOD
from ..utils.limbs import int_to_limbs
from . import field as F
from . import field_t as FT

FR = F.FR
L = FR.n_limbs  # 24 x 12-bit limbs
T_ROWS = 2 * L  # REDC consumes a [2L, ...] product array


def radix_list(n: int, rmax: int = 64) -> tuple:
    """Greedy factorization of n = 2^k into radices <= rmax, large radices
    first (the last pass carries no twiddle, so small tails are cheap)."""
    assert n & (n - 1) == 0 and n >= 2
    out = []
    while n > 1:
        r = min(rmax, n)
        out.append(r)
        n //= r
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _dft_limb_matrix(r: int, omega_r: int, col_scale: int = 1,
                     row_scale: int = 1, const_scale: int = 1) -> np.ndarray:
    """Stacked 6-bit-split DFT limb matrix [2*48r, r, 24] f32.

    Entry (k, j) of the underlying field matrix is
        const_scale * row_scale^k * omega_r^(kj) * col_scale^j * R  (mod p)
    i.e. the Montgomery form of the scaled DFT matrix; its canonical
    limbs fill M[(k*48 + t'), j, m] = limb_{t'-m}.  Stacked
    [M & 63; M >> 6] so one matmul yields both halves.  Exactness:
    operands <= 63 (matrix) x <= 127 (7-bit input splits) accumulated
    over 24r <= 1536 terms: 63*127*1536 < 2^24 — exact in the MXU's f32
    accumulator at DEFAULT (single-pass bf16) precision; integer inputs
    <= 127 are bf16-exact.
    """
    from ..utils.limbs import ints_to_limbs_fast

    vals = []
    w_k = 1  # omega_r^k
    u_k = const_scale % FR_MOD  # const * row_scale^k
    rbig = FR.r
    for k in range(r):
        wj = 1  # (omega_r^k)^j
        cj = 1  # col_scale^j
        for j in range(r):
            vals.append(u_k * wj % FR_MOD * cj % FR_MOD * rbig % FR_MOD)
            wj = wj * w_k % FR_MOD
            cj = cj * col_scale % FR_MOD
        w_k = w_k * omega_r % FR_MOD
        u_k = u_k * row_scale % FR_MOD
    digs = ints_to_limbs_fast(vals, L).reshape(r, r, L)  # [k, j, limb]
    m = np.zeros((r, T_ROWS, r, L), dtype=np.int32)
    for lidx in range(L):
        for mm in range(L):
            m[:, lidx + mm, :, mm] = digs[:, :, lidx]
    m = m.reshape(r * T_ROWS, r, L)
    return np.concatenate([m & 63, m >> 6], axis=0).astype(np.float32)


def _dft_matmul(mat_np: np.ndarray, x, r: int):
    """Apply the stacked split DFT matrix to x [L, done, r, rest] -> raw
    f32 split matmul outputs (lo, hi), each [2r, T, done*rest]:
    lo = [Mlo @ xlo ; Mhi @ xlo] (stacked on axis 0), hi likewise with
    xhi.  Recombination (with its int32 overflow bookkeeping) happens in
    the pass tail so the casts/shifts run in VMEM.

    Contraction runs as lax.dot_general over the (j, m) = (r-axis,
    limb-axis) pair directly — no explicit operand transpose.  Every
    accumulation is exact: operands <= 63 (6-bit matrix splits) x <= 127
    (7-bit input splits) over 24r <= 1536 terms < 2^24 in the MXU's f32
    accumulator; integer inputs <= 127 are bf16-exact at DEFAULT
    precision.
    """
    _, done, _, rest = x.shape
    w = jnp.asarray(mat_np)  # [2*rT, r, L]
    x_lo = (x & 127).astype(jnp.float32)
    x_hi = (x >> 7).astype(jnp.float32)
    dg = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1, 2), (2, 0)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    lo = dg(w, x_lo).reshape(2 * r, T_ROWS, done * rest)
    hi = dg(w, x_hi).reshape(2 * r, T_ROWS, done * rest)
    return lo, hi


def _twiddle(omega_np: int, r: int, rest: int):
    """Device twiddle block [L, r, rest] of omega_np^(k*j2), Montgomery
    form, built gather-free: the k-column base B[k] = omega_np^k comes
    from log2(r) doubling steps, then T grows along j2 by log2(rest)
    concat-and-multiply steps (T_{s+1} = [T_s, T_s * B^(2^s)]) — a lane
    gather of a power table measured ~10x slower at 2^20."""
    from .ntt import powers

    base = jnp.swapaxes(powers(omega_np, r), 0, 1)[:, :, None]
    t = jnp.swapaxes(F.one_mont(FR, (1,)), 0, 1)[:, None, :]
    t = jnp.broadcast_to(t, (L, r, 1))
    bp = base  # B^(2^s)
    width = 1
    while width < rest:
        t = jnp.concatenate([t, FT.mont_mul(FR, t, bp)], axis=2)
        width *= 2
        if width < rest:
            bp = FT.mont_mul(FR, bp, bp)
    return t[:, :, :rest]


def _tw_form(tw, done: int, rest: int):
    """[L, r, rest] twiddle -> the pass-tail form: [r, L, rest] int16,
    pre-tiled along lanes to the kernel block width when rest is
    narrower than a block (so the block index map can always fetch an
    aligned full-width tile)."""
    t = jnp.transpose(tw, (1, 0, 2)).astype(jnp.int16)
    width = min(_B_TW, done * rest)
    if rest < width:
        t = jnp.tile(t, (1, 1, width // rest))
    return t


def make_mats(n: int, omega_int: int, rmax: int = 64,
              col_scale: int = 1, row_scale: int = 1,
              const_scale: int = 1):
    """Per-pass stacked DFT limb matrices as DEVICE arrays, for passing
    into jitted transforms as arguments — embedding them as jit
    constants ships ~38 MB per matrix inside the compile payload (the
    remote-compile tunnel rejects the h-chain's ~10 of them)."""
    radices = radix_list(n, rmax)
    mats = []
    done = 1
    rest_total = n
    for p, r in enumerate(radices):
        rest = rest_total // r
        mats.append(jnp.asarray(_dft_limb_matrix(
            r, pow(omega_int, done * rest, FR_MOD),
            pow(col_scale, rest, FR_MOD),
            pow(row_scale, done, FR_MOD),
            const_scale if p == 0 else 1,
        )))
        done *= r
        rest_total = rest
    return tuple(mats)


def make_twiddles(n: int, omega_int: int, rmax: int = 64,
                  batch: int = 1):
    """Eager per-domain twiddle tables: one [r, L, >=rest] int16 device
    array per pass that has one (rest > 1; limbs < 2^12 so int16 is
    lossless — the pass-0 table at 2^23 is data-sized, 805 MB in int32).
    Pass to fft_t_mxu as an argument — rebuilding them inside the traced
    transform costs a full pointwise sweep per pass (~40 ms at 2^20).
    ``batch`` must match the fft_t_mxu call (it widens the pre-tiled
    narrow tables to the kernel block width)."""
    radices = radix_list(n, rmax)
    tws = []
    done = 1
    rest_total = n
    build = jax.jit(
        lambda o, r, rest, done: _tw_form(_twiddle(o, r, rest), done,
                                          rest),
        static_argnums=(0, 1, 2, 3),
    )
    for r in radices:
        rest = rest_total // r
        if rest > 1:
            tws.append(build(pow(omega_int, done, FR_MOD), r, rest,
                             batch * done))
        done *= r
        rest_total = rest
    return tuple(tws)


# ---------------------------------------------------------------------------
# Pallas pass tail: fold + ripple + REDC + twiddle in VMEM.
# ---------------------------------------------------------------------------


_B_TW = 2048  # pass-tail lane-block width (and the twiddle tile width)
_CHUNK_COLS = 1 << 16  # max pass columns per dot+tail (memory governor)


def _combine_raw(ll, hl, lh, hh):
    """Recombine the four f32 split matmuls into the int32 raw product
    pair t = t_a + t_b * 2^12 per limb row.

    M = Mlo + 64*Mhi ; x = xlo + 128*xhi:
        t = ll + lh*2^7 + hl*2^6 + hh*2^13.
    The true per-limb sum reaches 24r * (2^12)^2 ~ 2^34.6 at r = 64 —
    past int32 — so hh's 2^13 term is carried separately scaled to 2^12
    units and folded ONE LIMB ROW HIGHER (hh only reaches t' = 46, so
    row 47 is free):  t_a <= 12.3M + 409M + 787M < 2^31, t_b <= 6.4M.
    """
    t_a = (ll.astype(jnp.int32) + (lh.astype(jnp.int32) << 7)
           + (hl.astype(jnp.int32) << 6))
    t_b = hh.astype(jnp.int32) << 1
    return t_a + jnp.concatenate(
        [jnp.zeros_like(t_b[:1]), t_b[:-1]], axis=0
    )


def _pass_tail_kernel(ll_ref, hl_ref, lh_ref, hh_ref, tw_ref, wnp_ref,
                      wp_ref, out_ref, *, has_tw):
    # blocks: ll/hl/lh/hh [1, T, B] f32; tw [1, L, B] int16; out [1, L, B]
    t = _combine_raw(ll_ref[0], hl_ref[0], lh_ref[0], hh_ref[0])
    t = FT._ripple(t, 2)
    tables = (wnp_ref[...], wp_ref[...])
    out = FT._redc(FR, t, tables)  # [L, B]
    if has_tw:
        out = FT.mont_mul(FR, out, tw_ref[0].astype(jnp.int32), tables)
    out_ref[0] = out


def _pass_tail_pallas(lo, hi, tw, r: int, done: int, rest: int):
    """Split matmul outputs [2r, T, cols] (cols = done*rest) -> reduced
    (and twiddled) limbs [r, L, cols].  Entirely 2D inside the kernel;
    grid blocks over (k, col-chunks).  ``tw`` comes from
    :func:`make_twiddles`: [r, L, rest] when rest >= _B_TW, else a
    pre-tiled [r, L, B] block repeating every ``rest`` lanes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cols = done * rest
    B = min(_B_TW, cols)
    grid = (r, cols // B)
    w_np, w_p = FT.redc_tables(FR)
    has_tw = tw is not None
    if has_tw:
        if tw.shape[2] >= B:
            m = tw.shape[2] // B
            tw_spec = pl.BlockSpec((1, L, B), lambda k, c: (k, 0, c % m),
                                   memory_space=pltpu.VMEM)
        else:
            raise AssertionError(
                f"twiddle tile narrower than block: {tw.shape} vs B={B}"
            )
    else:
        tw = jnp.zeros((1, L, 1), jnp.int16)
        tw_spec = pl.BlockSpec((1, L, 1), lambda k, c: (0, 0, 0),
                               memory_space=pltpu.VMEM)

    def mm_spec(row_off):
        return pl.BlockSpec((1, T_ROWS, B),
                            lambda k, c, o=row_off: (o + k, 0, c),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_pass_tail_kernel, has_tw=has_tw)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            mm_spec(0),   # ll = Mlo @ xlo
            mm_spec(r),   # hl = Mhi @ xlo
            mm_spec(0),   # lh = Mlo @ xhi
            mm_spec(r),   # hh = Mhi @ xhi
            tw_spec,
            pl.BlockSpec(w_np.shape, lambda k, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_p.shape, lambda k, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, B), lambda k, c: (k, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, L, cols), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(lo, lo, hi, hi, tw, jnp.asarray(w_np), jnp.asarray(w_p))


def _pass_tail_xla(lo, hi, tw, tables, r: int, done: int, rest: int):
    """Bit-identical XLA form of the pass tail (CPU/test backend).
    Returns [r, L, cols] like the Pallas form."""
    cols = done * rest
    t = _combine_raw(
        # [2r, T, cols] halves -> fold r into the col axis for 2D math:
        # process per-k via moveaxis is layout-heavy; the simple form
        # keeps [r, T, cols] and vectorizes the limb ops over axis 1.
        jnp.swapaxes(lo[:r], 0, 1), jnp.swapaxes(lo[r:], 0, 1),
        jnp.swapaxes(hi[:r], 0, 1), jnp.swapaxes(hi[r:], 0, 1),
    )  # [T, r, cols]
    t = FT._ripple(t, 2)
    out = FT._redc(FR, t, tables)  # [L, r, cols]
    if tw is not None:
        twi = tw.astype(jnp.int32)  # [r, L, rest] or tiled [r, L, B]
        if twi.shape[2] != rest:
            twi = twi[:, :, :rest]
        reps = cols // twi.shape[2]
        twi = jnp.tile(twi, (1, 1, reps))  # [r, L, cols]
        out = FT.mont_mul(FR, out, jnp.swapaxes(twi, 0, 1), tables)
    return jnp.swapaxes(out, 0, 1)


# Profiler probe hook (utils.profiler): "skip_tail" replaces the pass
# tail (fold/ripple/REDC/twiddle) with a cheap cast of the raw matmul
# halves — wrong math, same matmul work — so the report can attribute
# pass time between the MXU dot and the VMEM tail WITHOUT forking the
# transform.  Production leaves None; the flag is read at trace time, so
# flip it only through :func:`probe_mode`, which clears jax's in-process
# jit cache on both edges (probe callers must still use a FRESH jit
# instance for the probed call, as utils.profiler does).
PROBE_MODE = None


@contextlib.contextmanager
def probe_mode(mode: str):
    global PROBE_MODE
    jax.clear_caches()
    PROBE_MODE = mode
    try:
        yield
    finally:
        PROBE_MODE = None
        jax.clear_caches()


def _use_pallas() -> bool:
    from ..config import ntt_pallas_tail

    return ntt_pallas_tail()


def fft_t_mxu(x, omega_int: int, n: int, tws=None, rmax: int = 64,
              col_scale: int = 1, row_scale: int = 1,
              const_scale: int = 1, mats=None, batch: int = 1):
    """[L, n] Montgomery limbs -> [L, n] NTT (natural order in and out).

    Equivalent to (with s=col_scale, u=row_scale, c=const_scale):
        out[k] = c * u^k * sum_j x[j] * s^j * omega^(jk)
    — so coset scalings (distribute_powers), 1/n, z_inv, or an R re-bias
    ride the host matrices at zero runtime cost.  ``tws`` from
    :func:`make_twiddles` (built inline when None — only sensible for
    tests: the inline build costs a pointwise sweep per pass).

    Each pass writes its output digit axis k_p MAJOR of the accumulated
    done axis, so after the last pass the flat index is
    k_{P-1}*(n/r_{P-1}) + ... + k_0 — the natural DFT index; no
    bit-reversal gather, no unscramble transpose.

    With ``batch > 1``, x is [L, batch * n] holding `batch` independent
    length-n transforms BATCH-MAJOR; the output is BATCH-MINOR
    [L, n * batch] (each pass pushes its digit axis major of the
    accumulated done axis, and the batch axis starts as that axis).  The
    batch rides the done axis, so twiddle tiling and the pass tails are
    untouched — this is what the mesh four-step NTT's local column/row
    transforms use (parallel.mesh.sharded_ntt_mxu).
    """
    assert x.shape == (L, batch * n), (x.shape, batch, n)
    radices = radix_list(n, rmax)
    tables = tuple(jnp.asarray(t) for t in FT.redc_tables(FR))

    x = x.reshape(L, batch, n)  # [L, layout_done, rest_total]
    done = 1  # transform-internal digit product (roots/scales use this)
    rest_total = n
    tw_i = 0
    for p, r in enumerate(radices):
        rest = rest_total // r
        a = x.reshape(L, batch * done, r, rest)
        if mats is not None:
            mat = mats[p]
        else:
            mat = _dft_limb_matrix(
                r, pow(omega_int, done * rest, FR_MOD),
                pow(col_scale, rest, FR_MOD),
                pow(row_scale, done, FR_MOD),
                const_scale if p == 0 else 1,
            )
        if rest > 1:
            if tws is not None:
                tw = tws[tw_i]
                tw_i += 1
            else:
                tw = _tw_form(_twiddle(pow(omega_int, done, FR_MOD),
                                       r, rest), batch * done, rest)
        else:
            tw = None

        def run(a_sl, tw_sl, dn, rs):
            lo, hi = _dft_matmul(mat, a_sl, r)
            if PROBE_MODE == "skip_tail":  # profiler: matmul cost only
                return ((lo[:r, :L] + hi[:r, :L]).astype(jnp.int32)
                        & 0xFFF)
            if _use_pallas():
                return _pass_tail_pallas(lo, hi, tw_sl, r, dn, rs)
            return _pass_tail_xla(lo, hi, tw_sl, tables, r, dn, rs)

        # memory governor: the split matmul outputs are 768 B/element —
        # ~6.4 GB transient at 2^23 — so huge passes run in column
        # chunks (done-axis when it is wide, else the rest-axis with the
        # twiddle sliced alike); chunk boundaries are contiguous column
        # slices of the [r, L, cols] output
        ldone = batch * done  # layout width of the done axis
        cols = ldone * rest
        if cols > _CHUNK_COLS:
            outs = []
            if ldone > 1:
                step = max(1, _CHUNK_COLS // rest)
                for s in range(0, ldone, step):
                    e = min(s + step, ldone)
                    outs.append(run(a[:, s:e], tw, e - s, rest))
            else:
                step = _CHUNK_COLS
                for s in range(0, rest, step):
                    e = min(s + step, rest)
                    tw_sl = None if tw is None else tw[:, :, s:e]
                    outs.append(run(a[:, :, :, s:e], tw_sl, 1, e - s))
            out = jnp.concatenate(outs, axis=2)
        else:
            out = run(a, tw, ldone, rest)
        # out [r, L, cols]: bring limbs leading; k_p lands MAJOR of done
        x = jnp.transpose(out, (1, 0, 2)).reshape(L, r * ldone, rest)
        done *= r
        rest_total = rest
    return x.reshape(L, n * batch)


# ---------------------------------------------------------------------------
# Pointwise Pallas kernels over [L, n] (the H(x) chain's a*b - c stage).
# ---------------------------------------------------------------------------


def _mulsub_kernel(a_ref, b_ref, c_ref, wnp_ref, wp_ref, out_ref):
    tables = (wnp_ref[...], wp_ref[...])
    ab = FT.mont_mul(FR, a_ref[...], b_ref[...], tables)
    out_ref[...] = FT.sub(FR, ab, c_ref[...])


def mulsub_rows(a, b, c):
    """mont_mul(a, b) - c elementwise over [L, n] limbs.

    In VMEM via Pallas on TPU (the XLA form of one pointwise mont_mul
    materializes every conv intermediate to HBM — measured ~50 ms at
    2^20 vs ~5 ms here); bit-identical XLA fallback on CPU."""
    n = a.shape[1]
    tables = FT.redc_tables(FR)
    if not _use_pallas():
        tabs = tuple(jnp.asarray(t) for t in tables)
        return FT.sub(FR, FT.mont_mul(FR, a, b, tabs), c)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = min(n, 2048)
    w_np, w_p = tables
    spec = pl.BlockSpec((L, B), lambda i: (0, i), memory_space=pltpu.VMEM)
    wspec = [
        pl.BlockSpec(w_np.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w_p.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        _mulsub_kernel,
        grid=(n // B,),
        in_specs=[spec, spec, spec] + wspec,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(a, b, c, jnp.asarray(w_np), jnp.asarray(w_p))


def fft_rows_mxu(a, omega_int: int, n: int, tws=None, rmax: int = 64,
                 col_scale: int = 1, row_scale: int = 1,
                 const_scale: int = 1, mats=None):
    """[n, L] Montgomery limbs -> [n, L] NTT — Domain._fft's layout.

    The two transposes are major-axis relayouts; all compute runs in the
    lane-friendly [L, n] form.
    """
    a = a.astype(jnp.int32)
    return jnp.swapaxes(
        fft_t_mxu(jnp.swapaxes(a, 0, 1), omega_int, n, tws, rmax,
                  col_scale, row_scale, const_scale, mats), 0, 1
    )
