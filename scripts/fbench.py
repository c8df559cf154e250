"""VPU/MXU instruction-cost probe for the transposed field kernels.

Times tight Pallas loops over [rows, P] int32/f32 arrays to calibrate the
bucket kernel's cost model (the thesis's VALUBusy/occupancy analysis,
tex/Figures/profiler.py, re-done for TPU):

  int32_mul / int32_add / f32_mul : raw elementwise throughput
  conv                            : one 33-limb schoolbook product
  mont_mul                        : full Montgomery multiply (conv+REDC)
  madd                            : one RCB mixed add (the bucket body)

Usage: python scripts/fbench.py [--p 2048] [--iters 64]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=2048)
    ap.add_argument("--repeat", type=int, default=5)
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/zktpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from zcash_gpu_thesis_tpu.ops import field_t as FT
    from zcash_gpu_thesis_tpu.ops.field import FQ

    P, iters = ns.p, ns.iters
    L = FQ.n_limbs
    rng = np.random.default_rng(0)
    a0 = rng.integers(0, 4096, size=(L, P)).astype(np.int32)
    b0 = rng.integers(0, 4096, size=(L, P)).astype(np.int32)
    w_np, w_p = FT.redc_tables(FQ)

    def run_kernel(body, n_in=2):
        """body(a, b) -> array like a; iterated `iters` times."""

        def kern(a_ref, b_ref, wnp_ref, wp_ref, o_ref):
            tables = (wnp_ref[...], wp_ref[...])

            def step(i, x):
                return body(x, b_ref[...], tables)

            o_ref[...] = jax.lax.fori_loop(0, iters, step, a_ref[...])

        fn = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((L, P), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return jax.jit(lambda a, b: fn(a, b, jnp.asarray(w_np),
                                       jnp.asarray(w_p)))

    def timed(label, fn, args, work_per_iter):
        out = fn(*args)
        np.asarray(out)  # compile+warm
        times = []
        for _ in range(ns.repeat):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            times.append(time.perf_counter() - t0)
        t = min(times)
        per = t / iters
        print(json.dumps({
            "label": label, "P": P, "iters": iters,
            "t_total": round(t, 5), "us_per_iter": round(per * 1e6, 2),
            "elem_ops_per_s": round(work_per_iter * iters / t / 1e9, 1),
        }))

    a = jnp.asarray(a0)
    b = jnp.asarray(b0)

    # raw elementwise chains (keep values bounded via mask)
    timed("int32_mul", run_kernel(
        lambda x, y, tb: (x * y) & 0xFFF), (a, b), L * P)
    timed("int32_add", run_kernel(
        lambda x, y, tb: (x + y) & 0xFFF), (a, b), L * P)
    f = a0.astype(np.float32)

    def f32_body(x, y, tb):
        z = (x.astype(jnp.float32) * 1.00001)
        return z.astype(jnp.int32) & 0xFFF

    timed("f32_mul_cvt", run_kernel(f32_body), (a, b), 3 * L * P)

    # one schoolbook conv (the data-dependent product core)
    def conv_body(x, y, tb):
        t = FT._conv(x, y, L)
        return FT._ripple(t, 1)[:L] & 0xFFF

    timed("conv33", run_kernel(conv_body), (a, b), L * L * P)

    def mont_body(x, y, tb):
        return FT.mont_mul(FQ, x, y, tb)

    timed("mont_mul", run_kernel(mont_body), (a, b), L * L * P)

    def mont_vpu_body(x, y, tb):
        # inline REDC with the pad-and-add const convs (no MXU tables)
        t = FT._ripple(FT._conv(x, y, L), 2)
        m = FT._ripple_mod(FT._conv_const_vpu(t[:L], FQ.nprime_digits, L), 2)
        s = FT._ripple(FT._conv_const_vpu(m, FQ.p_digits, 2 * L) + t, 3)
        import jax.numpy as _jnp
        carry = _jnp.any(s[:L] != 0, axis=0, keepdims=True).astype(
            _jnp.int32)
        out = s[L:]
        return _jnp.concatenate([out[:1] + carry, out[1:]], axis=0)

    timed("mont_mul_vpu_redc", run_kernel(mont_vpu_body), (a, b),
          L * L * P)

    # a full mixed add over a [3x] state (the bucket body minus selects)
    from zcash_gpu_thesis_tpu.ops import msm_pallas as MP

    fad = MP._Ft(FQ, 12)

    def madd_kern(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, wnp_ref,
                  wp_ref, ox, oy, oz):
        fad.tables = (wnp_ref[...], wp_ref[...])

        def step(i, st):
            return MP._madd_t(fad, st, (x2_ref[...], y2_ref[...]))

        rx, ry, rz = jax.lax.fori_loop(
            0, iters, step, (x1_ref[...], y1_ref[...], z1_ref[...]))
        ox[...] = rx
        oy[...] = ry
        oz[...] = rz

    madd_fn = pl.pallas_call(
        madd_kern,
        out_shape=[jax.ShapeDtypeStruct((L, P), jnp.int32)] * 3,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
    )

    from zcash_gpu_thesis_tpu.oracle import curve as O
    from zcash_gpu_thesis_tpu.ops import curve as cv
    import random

    pts = O.random_g1_points(random.Random(0), 2)
    aff = cv.g1_affine_from_ints(pts)
    px = np.broadcast_to(np.asarray(aff[0])[0][:, None], (L, P)).copy()
    py = np.broadcast_to(np.asarray(aff[1])[0][:, None], (L, P)).copy()
    qx = np.broadcast_to(np.asarray(aff[0])[1][:, None], (L, P)).copy()
    qy = np.broadcast_to(np.asarray(aff[1])[1][:, None], (L, P)).copy()
    one = np.zeros((L, P), np.int32)
    from zcash_gpu_thesis_tpu.utils.limbs import int_to_limbs

    for i, d in enumerate(int_to_limbs(FQ.r, L)):
        one[i, :] = int(d)

    madd_jit = jax.jit(lambda *xs: madd_fn(*xs))
    timed("madd", lambda *xs: madd_jit(*xs)[0],
          (jnp.asarray(px), jnp.asarray(py), jnp.asarray(one),
           jnp.asarray(qx), jnp.asarray(qy), jnp.asarray(w_np),
           jnp.asarray(w_p)), 11 * L * L * P)


if __name__ == "__main__":
    main()
