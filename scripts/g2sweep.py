"""G2 bucket-kernel config sweep on the real TPU.

Times ``msm_device_proj`` for G2 at the Sapling b_g2 shape (2^16 padded)
across window width c, (chunks, k_inner) and the Fq2 product strategy
(ZKTPU_FQ2_MUL) — the reference's analog is its chunk-size sweeps
(multiexp.rs:2825).  Each config is one Mosaic compile; results print as
one line per config.

Usage: python scripts/g2sweep.py [c:chunks:k_inner ...]
Env: ZKTPU_FQ2_MUL=schoolbook|karatsuba picks the Fq2 mul.
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/zktpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from zcash_gpu_thesis_tpu.ops import curve as cv  # noqa: E402
from zcash_gpu_thesis_tpu.ops import msm as M  # noqa: E402
from zcash_gpu_thesis_tpu.ops import msm_pallas as MP  # noqa: E402
from zcash_gpu_thesis_tpu.oracle import curve as O  # noqa: E402

N = 1 << 16


def main():
    configs = sys.argv[1:] or ["7:16:8", "6:16:8", "8:16:8", "7:8:16",
                               "7:32:8"]
    rng = random.Random(0x5DBE6259)
    base = O.random_g2_points(rng, 16)
    pts = [base[i % 16] for i in range(N)]
    scalars = [rng.randrange(O.R) for _ in range(N)]
    aff = jax.tree.map(jnp.asarray, cv.g2_affine_from_ints(pts))
    mul_mode = os.environ.get("ZKTPU_FQ2_MUL", "schoolbook")

    want = None
    for j in range(16):
        s = sum(scalars[j::16]) % O.R
        want = O.g2_add(want, O.g2_mul(base[j], s))

    for cfg in configs:
        c, chunks, k_inner = (int(x) for x in cfg.split(":"))
        digits = jnp.asarray(
            M.recode_signed(M.digits_from_ints(scalars, c), c))

        def run():
            packed = MP.msm_device_proj(cv.G2, aff, digits, c, chunks,
                                        k_inner, slice_n=N)
            return np.asarray(packed)

        t0 = time.perf_counter()
        out = run()
        t_cold = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run()
            ts.append(time.perf_counter() - t0)
        got = MP.packed_to_int_point(cv.G2, out)
        ok = got == want
        print(f"g2 2^16 c={c} chunks={chunks} k={k_inner} "
              f"mul={mul_mode}: {min(ts)*1e3:.1f} ms "
              f"(cold {t_cold:.1f}s) bit_exact={ok}", flush=True)


if __name__ == "__main__":
    main()
