"""Per-kernel profiling + speed-of-light model.

The reference's perf methodology (SURVEY.md §5): wall-clock spans per
kernel and vendor-profiler utilization analysis (VALUBusy/MemUnitBusy,
tex/Figures/profiler.py; size sweeps in multiexp.rs:2825 and
tex/Figures/finalresults.py).  Here: each hot kernel is timed at a sweep
of production sizes, the fixed dispatch+sync floor (a null kernel at the
same shape) is measured and subtracted, and the dispatch-free rate is
compared against an analytic op-count model and the hardware's peak
int32/VPU throughput — the TPU analogue of the thesis's occupancy
tables.  A compute-only row (a Pallas kernel chaining 8192 mont_mul
iterations over a [L, 2048] VMEM block, amortizing all dispatch)
anchors the true field-multiply rate.

Run `python -m zcash_gpu_thesis_tpu.utils.profiler` to print the table
(and write PERF.md with --write; --full adds the 2^20 MSM / 2^23 NTT
rows, several minutes of TPU time).

Op-count models (int32-op tallies per element):
  * Fq mont_mul: variable conv (L^2 MAC = 2 ops each + L^2 pad-adds) +
    2 const convs (on the MXU when enabled: excluded) + ripple/carry.
  * G1 mixed add: 11 Fq muls + ~14 adds/normalizes.
  * Fr NTT butterfly: 1 Fr mul + add + sub per pair per stage.
  * MSM bucket pass: n * W mixed adds (W = 65 signed 4-bit windows).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _sync(x):
    import jax

    jax.block_until_ready(x)
    # the experimental axon backend can return early from
    # block_until_ready; a tiny host read forces real completion.  The
    # slice happens on device so only one element crosses the tunnel —
    # a full np.asarray here would add an O(n) readback that the
    # shape-capped null floor can't cancel at 2^20+.
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.reshape(-1)[:1])
    return x


def time_fn(fn, *args, warmup: int = 1, iters: int = 3) -> float:
    for _ in range(warmup):
        _sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


# Peak assumptions per backend (int32 ops/s on the vector path).
PEAKS = {
    "tpu": 2.0e12,   # v5e VPU-class int32 throughput (order of magnitude)
    "cpu": 5.0e10,
}


def _rand_elems(spec, count, seed=11):
    import random

    import jax.numpy as jnp

    from ..ops import field as F

    r = random.Random(seed)
    return jnp.asarray(F.batch_to_limbs(
        spec, [r.randrange(spec.modulus) for _ in range(count)]))


def _null_floor(n_rows: int, lanes: int) -> float:
    """Dispatch + sync floor: a jitted elementwise op on the same-shape
    array, timed exactly like the kernels."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((n_rows, lanes), jnp.int32)
    f = jax.jit(lambda v: v + 1)
    return time_fn(f, x)


def field_rows(sizes):
    """(label, time, floor, model_ops) rows for mont_mul + mixed add."""
    import functools
    import random as _r

    import jax

    from ..oracle import curve as O
    from ..ops import curve as cv
    from ..ops import field as F
    from ..ops.curve import G1

    L = F.FQ.n_limbs
    rows = []
    for n in sizes:
        a = _rand_elems(F.FQ, min(n, 1 << 14))
        import jax.numpy as jnp

        reps = max(1, n // a.shape[0])
        a = jnp.tile(a, (reps, 1))[:n]
        b = jnp.roll(a, 1, axis=0)
        mul = jax.jit(lambda x, y: F.mont_mul(F.FQ, x, y))
        ops = n * (3 * L * L + 60 * L)
        t = time_fn(mul, a, b)
        floor = _null_floor(n, L)
        rows.append((f"fq_mont_mul[2^{n.bit_length()-1}]", t, floor, ops))

        rr = _r.Random(3)
        base = O.random_g1_points(rr, 4)
        pts = [base[i % 4] for i in range(min(n, 4096))]
        aff_small = cv.g1_affine_from_ints(pts)
        aff = jax.tree.map(
            lambda l: jnp.tile(l, (max(1, n // l.shape[0]),)
                               + (1,) * (l.ndim - 1))[:n], aff_small)
        proj = G1.from_affine(aff)
        addm = jax.jit(G1.add_mixed)
        add_ops = n * (11 * (3 * L * L) + 14 * 8 * L)
        t = time_fn(addm, proj, aff)
        rows.append((f"g1_add_mixed[2^{n.bit_length()-1}]", t, floor,
                     add_ops))
    return rows


def compute_only_row(iters: int = 8192, lanes: int = 2048):
    """Dispatch-amortized mont_mul rate: one Pallas kernel chaining
    `iters` multiplies over a [L, lanes] VMEM block (scripts/fbench.py's
    probe, inlined).

    lanes=2048 keeps the mont_mul intermediate graph inside the 16 MB
    scoped-VMEM stack limit on the real chip (8192 lanes OOMs at 23 MB);
    iters is raised to keep dispatch amortized to noise."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..ops import field_t as FT
    from ..ops.field import FQ

    L = FQ.n_limbs
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 4096, size=(L, lanes)).astype(np.int32))
    b = jnp.asarray(rng.integers(0, 4096, size=(L, lanes)).astype(np.int32))
    w_np, w_p = FT.redc_tables(FQ)

    def kern(a_ref, b_ref, wnp_ref, wp_ref, o_ref):
        tables = (wnp_ref[...], wp_ref[...])

        def step(i, x):
            return FT.mont_mul(FQ, x, b_ref[...], tables)

        o_ref[...] = jax.lax.fori_loop(0, iters, step, a_ref[...])

    fn = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((L, lanes), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jfn = jax.jit(lambda x, y: fn(x, y, jnp.asarray(w_np),
                                  jnp.asarray(w_p)))
    t = time_fn(jfn, a, b)
    ops = iters * lanes * (3 * L * L + 60 * L)
    return (f"fq_mont_mul_compute[{iters}x{lanes}]", t, 0.0, ops)


def ntt_rows(logs):
    """Production NTT (the MXU matmul transform via Domain.fft) plus a
    matmul-only probe per size, attributing pass time between the MXU
    dot and the VMEM tail (fold/ripple/REDC/twiddle) — the round-3
    VERDICT's requested split.  The model-op tally stays the butterfly
    count (what a radix-2 implementation would execute), so the % column
    reads as speedup-vs-butterfly-peak like the thesis's VALUBusy
    figures."""
    import jax

    from ..ops import field as F
    from ..ops import ntt_mxu as NM
    from ..ops.ntt import Domain

    Lr = F.FR.n_limbs
    rows = []
    for log_n in logs:
        n = 1 << log_n
        d = Domain(n)
        small = _rand_elems(F.FR, min(n, 1 << 14))
        import jax.numpy as jnp

        coeffs = jnp.tile(small, (max(1, n // small.shape[0]), 1))[:n]
        # Domain.fft dispatches to its own jitted executable with the
        # twiddle/matrix tables as ARGUMENTS — wrapping it in another
        # jax.jit would build those tables under the trace and cache
        # tracers into the domain (UnexpectedTracerError on reuse)
        if d.impl == "mxu":
            d.tws_for(d.omega)
            d.mats_for(d.omega)
        fft = d.fft
        ops = (n // 2) * log_n * (3 * Lr * Lr + 60 * Lr)
        t = time_fn(fft, coeffs)
        floor = _null_floor(min(n, 1 << 17), Lr)
        tag = "mxu" if d.impl == "mxu" else "bfly"
        rows.append((f"fr_ntt_{tag}[2^{log_n}]", t, floor, ops))
        if d.impl == "mxu":
            # matmul-only: the real transform with its tail probe on
            # (wrong math, same MXU work) — fresh jit instance so the
            # probe flag is read at trace time
            tws = d.tws_for(d.omega)
            mats = d.mats_for(d.omega)
            with NM.probe_mode("skip_tail"):
                t_mm = time_fn(
                    jax.jit(lambda x, t, m: NM.fft_rows_mxu(
                        x, d.omega, n, t, mats=m)),
                    coeffs, tws, mats)
            rows.append((f"fr_ntt_mxu_matmul_only[2^{log_n}]", t_mm,
                         floor, ops))
    return rows


def msm_rows(logs, g2_logs=()):
    """Production Pallas bucket path (window sums, the device-side hot
    loop) at each size; model = n * W mixed adds."""
    import random as _r

    import jax.numpy as jnp

    from ..constants import R
    from ..oracle import curve as O
    from ..ops import curve as cv
    from ..ops import field as F
    from ..ops import msm as M
    from ..ops import msm_pallas as MP

    L = F.FQ.n_limbs
    rr = _r.Random(5)
    rows = []

    def one(group, log_n, nbase, from_ints, rand_pts, tag, nc, c,
            chunks, k_inner, slice_n=1 << 20):
        """Production bucket config per group: G1 c=6/(16,8), G2 the
        g2_c()/g2_pallas_params() defaults — the kernels every proof
        actually runs (round-3 VERDICT: no stale-config rows)."""
        n = 1 << log_n
        base = rand_pts(rr, nbase)
        aff = from_ints([base[i % nbase] for i in range(min(n, 1 << 17))])
        import jax

        aff = jax.tree.map(
            lambda l: jnp.tile(l, (max(1, n // l.shape[0]),)
                               + (1,) * (l.ndim - 1))[:n], aff)
        scal = [rr.randrange(R) for _ in range(min(n, 1 << 14))]
        digits = M.recode_signed(M.digits_from_ints(scal, c), c)
        digits = jnp.asarray(np.tile(digits, (max(1, n // len(scal)), 1))[:n])
        w = digits.shape[1]
        # the PRODUCTION path: sliced bucket sweeps + the in-VMEM fused
        # combine (what every proof's MSM resolve executes) — the older
        # window_sums form pays an XLA suffix scan over the full bucket
        # tensor that the fused kernel eliminated
        fn = lambda a, d: MP.msm_device_proj(group, a, d, c, chunks,
                                             k_inner, slice_n=slice_n)
        ops = n * w * nc * nc * (11 * 3 * L * L + 14 * 8 * L)
        t = time_fn(fn, aff, digits, iters=2)
        rows.append((f"{tag}_msm_dev[2^{log_n},c={c}]", t, 0.0, ops))

    from ..config import g2_c, g2_pallas_params, msm_config

    c1 = msm_config().c
    for log_n in logs:
        one(cv.G1, log_n, 64, cv.g1_affine_from_ints, O.random_g1_points,
            "g1", 1, c1, 16, 8)
    for g2_log in g2_logs:
        ck = g2_pallas_params()
        sl = 1 << 16  # g2_pad_floor: every G2 MSM slices at 2^16
        if (1 << g2_log) > sl:
            # chained-state sweeps run at half lane width (the init-form
            # kernel's VMEM state does not fit at 16 chunks; engine.py)
            ck = (max(ck[0] // 2, 4), ck[1])
        one(cv.G2, g2_log, 8, cv.g2_affine_from_ints, O.random_g2_points,
            "g2", 2, g2_c(), ck[0], ck[1], slice_n=sl)
    return rows


def report(full: bool = False) -> str:
    import jax

    backend = jax.default_backend()
    peak = PEAKS.get("tpu" if backend not in PEAKS else backend, PEAKS["cpu"])
    lines = [
        "# Per-kernel speed-of-light report",
        "",
        f"backend: `{backend}`  |  assumed int32 vector peak: "
        f"{peak:.1e} ops/s",
        "",
        "All rows are device-warm minima of 2-3 runs.  `t - floor`"
        " subtracts a same-shape null-kernel dispatch+sync round trip"
        " (the tunnel latency the thesis's figures excluded by looping"
        " on device); `% peak` uses the dispatch-free time.",
        "",
        "| kernel | t | floor | t - floor | model ops | ops/s | % peak |",
        "|---|---|---|---|---|---|---|",
    ]
    msm_logs = [14, 17] + ([20] if full else [])
    ntt_logs = [17] + ([20, 23] if full else [20])
    rows = (field_rows([1 << 13, 1 << 17] + ([1 << 20] if full else []))
            + [compute_only_row()]
            + ntt_rows(ntt_logs)
            + msm_rows(msm_logs, g2_logs=(17, 20) if full else ()))
    for name, t, floor, ops in rows:
        tc = t - floor
        if tc <= 0:
            # Noise-dominated row: the null-kernel floor exceeded the
            # measured time, so a dispatch-free rate is undefined.
            lines.append(
                f"| {name} | {t*1e3:.1f} ms | {floor*1e3:.1f} ms |"
                f" n/a (below dispatch floor) | {ops:.2e} | n/a | n/a |"
            )
            continue
        rate = ops / tc
        lines.append(
            f"| {name} | {t*1e3:.1f} ms | {floor*1e3:.1f} ms |"
            f" {tc*1e3:.1f} ms | {ops:.2e} | {rate:.2e} |"
            f" {100*rate/peak:.1f}% |"
        )
    lines += [
        "",
        "Model counts are analytic int32-op tallies per element (module "
        "docstring); the % column is the TPU analogue of the thesis's "
        "VALUBusy profiler figures (tex/Figures/profiler.py).  NTT rows "
        "keep the BUTTERFLY op tally as the model even for the MXU "
        "transform, so their % reads as speedup against the ideal "
        "radix-2 vector implementation — matmul-only rows can exceed "
        "100% because the MXU executes a different (denser) algorithm "
        "on a different unit.  The "
        "`fq_mont_mul_compute` row is the dispatch-amortized in-VMEM "
        "rate — the ceiling the bucket kernel's 11-mul mixed adds run "
        "against.  Whole-proof phase splits (FFT vs MSM vs blinding) are "
        "measured by `bench.py --mode spend` and recorded in "
        "PROGRESS.md/BENCH artifacts.",
    ]
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true", help="write PERF.md")
    ap.add_argument("--full", action="store_true",
                    help="add 2^20 MSM / 2^23 NTT / G2 rows")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/zktpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    text = report(full=args.full)
    print(text)
    if args.write:
        with open("PERF.md", "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
