"""Micro-bench probes for the Pallas bucket kernel (real TPU).

Times bucket_accumulate variants at the headline shape (131k G1, c=5,
chunks=16, k_inner=8) to attribute kernel time between the madd field
math, the one-hot select, and the lane broadcast.

Usage: python scripts/kbench.py [probe ...]
Probes: full fused kernel_only madd_add noselect
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/zktpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from zcash_gpu_thesis_tpu.ops import curve as cv  # noqa: E402
from zcash_gpu_thesis_tpu.ops import field_t as FT  # noqa: E402
from zcash_gpu_thesis_tpu.ops import msm as M  # noqa: E402
from zcash_gpu_thesis_tpu.ops import msm_pallas as MP  # noqa: E402
from zcash_gpu_thesis_tpu.oracle import curve as O  # noqa: E402

import random  # noqa: E402

N = int(os.environ.get("KB_N", 131072))
C = int(os.environ.get("KB_C", 5))
CHUNKS = int(os.environ.get("KB_CHUNKS", 16))
K_INNER = int(os.environ.get("KB_K", 8))


def setup():
    rng = random.Random(0x5DBE6259)
    base = O.random_g1_points(rng, 64)
    pts = [base[i % 64] for i in range(N)]
    scalars = [rng.randrange(O.R) for _ in range(N)]
    aff = cv.g1_affine_from_ints(pts)
    digits = jnp.asarray(M.recode_signed(M.digits_from_ints(scalars, C), C))
    return aff, digits


def timeit(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    probes = sys.argv[1:] or ["full", "kernel_only", "madd_add", "noselect"]
    aff, digits = setup()

    def patched_kernel_time(patch):
        """Time bucket_state with FT.mont_mul/mont_mul_acc monkeypatched
        (wrong math, representative cost)."""
        orig_mul, orig_acc = FT.mont_mul, FT.mont_mul_acc
        patch()
        MP.bucket_state.clear_cache()
        try:
            return timeit(lambda: MP.bucket_state(
                cv.G1, aff, digits, C, CHUNKS, K_INNER))
        finally:
            FT.mont_mul, FT.mont_mul_acc = orig_mul, orig_acc
            MP.bucket_state.clear_cache()

    if "conv_only" in probes:
        # mul = variable conv + ripple, REDC dropped
        def patch():
            def mul(spec, a, b, tables=None):
                return FT._ripple(FT._conv(a, b, spec.n_limbs), 2)[
                    : spec.n_limbs]

            def acc(spec, pairs, tables=None):
                t = sum(FT._conv(x, y, spec.n_limbs) for x, y in pairs)
                return FT._ripple(t, 2)[: spec.n_limbs]

            FT.mont_mul, FT.mont_mul_acc = mul, acc

        t = patched_kernel_time(patch)
        print(f"kernel_conv_only_mul: {t*1e3:.1f} ms")

    if "redc_only" in probes:
        # mul = REDC of a fabricated [2L] product, conv dropped
        def patch():
            def mul(spec, a, b, tables=None):
                t = jnp.concatenate([a, b], axis=0)
                return FT._redc(spec, t, tables)

            def acc(spec, pairs, tables=None):
                x, y = pairs[0]
                t = jnp.concatenate([x, y], axis=0)
                return FT._redc(spec, t, tables)

            FT.mont_mul, FT.mont_mul_acc = mul, acc

        t = patched_kernel_time(patch)
        print(f"kernel_redc_only_mul: {t*1e3:.1f} ms")

    if "full" in probes:
        t = timeit(lambda: MP.msm_device_proj(
            cv.G1, aff, digits, C, CHUNKS, K_INNER))
        print(f"full_msm_device: {t*1e3:.1f} ms")
        # bit-exact check: the point stream tiles 64 bases, so truth is
        # sum_j (sum of class-j scalars) * P_j — 64 host scalar-mults
        got = MP.packed_to_int_point(
            cv.G1, MP.msm_device_proj(cv.G1, aff, digits, C, CHUNKS,
                                      K_INNER))
        rng = random.Random(0x5DBE6259)
        base = O.random_g1_points(rng, 64)
        pts_s = [rng.randrange(O.R) for _ in range(N)]
        want = None
        for j in range(64):
            tot = sum(pts_s[j::64]) % O.R
            want = O.g1_add(want, O.g1_mul(base[j], tot))
        print("full_msm_bit_exact:", got == want)

    if "kernel_only" in probes:
        t = timeit(lambda: MP.bucket_accumulate(
            cv.G1, aff, digits, C, CHUNKS, K_INNER))
        print(f"bucket_kernel_only: {t*1e3:.1f} ms")

    if "madd_add" in probes:
        # madd replaced with three plain field adds (wrong math, same
        # data movement): isolates the mul/REDC cost of the madd
        orig = MP._madd_t

        def fake_madd(f, acc, aff2):
            x1, y1, z1 = acc
            x2, y2 = aff2
            return (f.add(x1, x2), f.add(y1, y2), f.double(z1))

        MP._madd_t = fake_madd
        MP.bucket_accumulate.clear_cache(); MP.bucket_state.clear_cache()
        try:
            t = timeit(lambda: MP.bucket_accumulate(
                cv.G1, aff, digits, C, CHUNKS, K_INNER))
            print(f"kernel_madd_as_adds: {t*1e3:.1f} ms")
        finally:
            MP._madd_t = orig
            MP.bucket_accumulate.clear_cache(); MP.bucket_state.clear_cache()

    if "noselect" in probes:
        # the REAL kernel with its probe hook: accumulate into bucket 0
        # only (no one-hot gather/scatter) — isolates the select cost
        # (compare with kernel_only).  No kernel-body fork: the hook
        # lives inside msm_pallas._kernel itself.
        with MP.probe_mode("noselect"):
            t = timeit(lambda: MP.bucket_accumulate(
                cv.G1, aff, digits, C, CHUNKS, K_INNER))
            print(f"kernel_no_select: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
