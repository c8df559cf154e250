"""Sweep (c, chunks, k_inner) for the fused G1 bucket+combine path at the
headline shape (131,071 points) on the real chip — the TPU analogue of the
reference's chunk-size sweep (multiexp.rs:2825, sweeping chunk 300-4000 per
kernel config).

Usage: python scripts/sweep_msm.py "c,chunks,k;c,chunks,k;..."
Prints one line per config: c chunks k t_ms ok.
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/zktpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from zcash_gpu_thesis_tpu.ops import curve as cv  # noqa: E402
from zcash_gpu_thesis_tpu.ops import msm as M  # noqa: E402
from zcash_gpu_thesis_tpu.ops import msm_pallas as MP  # noqa: E402
from zcash_gpu_thesis_tpu.ops.curve import G1  # noqa: E402
from zcash_gpu_thesis_tpu.oracle import curve as O  # noqa: E402

N = 131071


def main():
    combos = [tuple(int(x) for x in s.split(","))
              for s in (sys.argv[1] if len(sys.argv) > 1
                        else "6,16,8").split(";")]
    rng = random.Random(0x5DBE6259)
    base = O.random_g1_points(rng, 64)
    pts = [base[i % 64] for i in range(N)]
    scalars = [rng.randrange(O.R) for _ in range(N)]
    aff = cv.g1_affine_from_ints(pts)

    want = None
    for j in range(64):
        s = sum(scalars[j::64]) % O.R
        want = O.g1_add(want, O.g1_mul(base[j], s))

    for c, chunks, k_inner in combos:
        digits = jnp.asarray(
            M.recode_signed(M.digits_from_ints(scalars, c), c))

        def run():
            return MP.msm_host_pallas_fused(G1, aff, digits, c, chunks,
                                            k_inner)

        try:
            t0 = time.time()
            out = run()  # compile + first run
            t_first = time.time() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            ok = out == want
            print(f"c={c} chunks={chunks} k={k_inner} "
                  f"t={best*1e3:.1f}ms first={t_first:.1f}s ok={ok}",
                  flush=True)
        except Exception as ex:  # keep sweeping past invalid configs
            print(f"c={c} chunks={chunks} k={k_inner} FAILED: {ex!r}",
                  flush=True)


if __name__ == "__main__":
    main()
