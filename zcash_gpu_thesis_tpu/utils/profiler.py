"""Per-kernel profiling + speed-of-light model.

The reference's perf methodology (SURVEY.md §5): wall-clock spans per
kernel and vendor-profiler utilization analysis (VALUBusy/MemUnitBusy,
tex/Figures/profiler.py).  Here: each hot kernel is timed on the current
backend and compared against an analytic op-count model and the
hardware's peak int32/VPU throughput — the TPU analogue of the thesis's
occupancy tables.

Run `python -m zcash_gpu_thesis_tpu.utils.profiler` to print the table
(and write PERF.md with --write).

Op-count models (per element):
  * Fq mont_mul: 1 variable conv (L^2 MAC = 2 ops each) + 2 const convs
    (offloaded to MXU when enabled) + ripples.
  * G1 add_mixed: 11 Fq muls + ~20 adds.
  * Fr NTT butterfly: 1 Fr mul + add + sub per pair per stage.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _sync(x):
    import jax

    jax.block_until_ready(x)
    # the experimental axon backend can return early from
    # block_until_ready; a tiny host read forces real completion
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf).ravel()[:1]
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


def kernel_suite(n: int = 8192):
    """Return [(name, fn, args, model_int32_ops)] for the hot kernels."""
    import jax.numpy as jnp
    import jax

    from ..constants import R
    from ..ops import field as F
    from ..ops import msm as M
    from ..ops.curve import G1
    from ..ops.ntt import Domain

    rng = np.random.default_rng(7)

    def rand_elems(spec, count):
        import random

        r = random.Random(11)
        return jnp.asarray(
            F.batch_to_limbs(spec, [r.randrange(spec.modulus) for _ in range(count)])
        )

    out = []

    # Fq Montgomery multiply
    a = rand_elems(F.FQ, n)
    b = rand_elems(F.FQ, n)
    L = F.FQ.n_limbs
    mul_ops = n * (2 * L * L + (0 if F._redc_mxu() else 4 * L * L) + 30 * 2 * L)
    mul = jax.jit(lambda a, b: F.mont_mul(F.FQ, a, b))
    out.append((f"fq_mont_mul[{n}]", mul, (a, b), mul_ops))

    # G1 mixed addition (batched)
    from ..oracle import curve as O
    import random as _r

    rr = _r.Random(3)
    base = O.random_g1_points(rr, 4)
    pts = [base[i % 4] for i in range(n)]
    from ..ops import curve as cv

    aff = cv.g1_affine_from_ints(pts)
    proj = G1.from_affine(aff)
    add_ops = n * 14 * (2 * L * L + (0 if F._redc_mxu() else 4 * L * L))
    addm = jax.jit(G1.add_mixed)
    out.append((f"g1_add_mixed[{n}]", addm, (proj, aff), add_ops))

    # Fr NTT
    d = Domain(n)
    coeffs = rand_elems(F.FR, n)
    Lr = F.FR.n_limbs
    log_n = n.bit_length() - 1
    ntt_ops = (n // 2) * log_n * (2 * Lr * Lr + 60 * Lr)
    fft = jax.jit(d.fft)
    out.append((f"fr_ntt[{n}]", fft, (coeffs,), ntt_ops))

    # MSM window accumulation
    scalars = [rr.randrange(R) for _ in range(n)]
    digits = jnp.asarray(M.digits_from_ints(scalars, 4))
    msm_ops = n * 64 * 14 * 2 * L * L
    ws = lambda aff, digits: M.window_sums_affine(G1, aff, digits, 4, 16, 8)
    out.append((f"g1_msm_window_sums[{n}]", ws, (aff, digits), msm_ops))

    return out


def report(n: int = 8192) -> str:
    import jax

    backend = jax.default_backend()
    peak = PEAKS.get("tpu" if backend not in PEAKS else backend, PEAKS["cpu"])
    lines = [
        "# Per-kernel speed-of-light report",
        "",
        f"backend: `{backend}`  |  assumed int32 peak: {peak:.1e} ops/s",
        "",
        "| kernel | time | model int32 ops | achieved ops/s | % of peak |",
        "|---|---|---|---|---|",
    ]
    for name, fn, args, ops in kernel_suite(n):
        t = time_fn(fn, *args)
        rate = ops / t
        lines.append(
            f"| {name} | {t*1e3:.2f} ms | {ops:.2e} | {rate:.2e} |"
            f" {100*rate/peak:.1f}% |"
        )
    lines.append("")
    lines.append(
        "Model counts are analytic MAC/add tallies per element (see module "
        "docstring); the % column is the TPU analogue of the thesis's "
        "VALUBusy profiler figures (tex/Figures/profiler.py)."
    )
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--write", action="store_true", help="write PERF.md")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/zktpu_jax_cache")
    text = report(args.n)
    print(text)
    if args.write:
        with open("PERF.md", "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
