"""G2 bucket-kernel config sweep at the b_g2 shape (2^16 points).

The Sapling b_g2 MSM (61,301 live bases compacted to one 2^16 slice) is
the proof's second-largest line; this times the full fused device sweep
at a requested (c, chunks, k_inner) with a bit-exact oracle check.

Usage: G2B_C=8 G2B_CHUNKS=8 G2B_K=8 python scripts/g2bench.py
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

N = int(os.environ.get("G2B_N", 1 << 16))
C = int(os.environ.get("G2B_C", 7))
CHUNKS = int(os.environ.get("G2B_CHUNKS", 16))
K = int(os.environ.get("G2B_K", 8))


def main():
    rng = random.Random(0x5DBE6259)
    base = O.random_g2_points(rng, 16)
    pts = [base[i % 16] for i in range(N)]
    scalars = [rng.randrange(O.R) for _ in range(N)]
    aff = jax.tree.map(jnp.asarray, cv.g2_affine_from_ints(pts))
    digits = jnp.asarray(
        M.recode_signed(M.digits_from_ints(scalars, C), C))

    def run():
        return MP.msm_host_pallas_fused(cv.G2, aff, digits, C, CHUNKS, K,
                                        slice_n=N)

    got = run()  # warmup/compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        got = run()
        ts.append(time.perf_counter() - t0)

    want = None
    for j in range(16):
        tot = sum(scalars[j::16]) % O.R
        want = O.g2_add(want, O.g2_mul(base[j], tot))
    ok = got == want
    print(f"g2_msm n=2^{N.bit_length()-1} c={C} chunks={CHUNKS} k={K}: "
          f"{min(ts)*1e3:.1f} ms  bit_exact={ok}")
    assert ok


if __name__ == "__main__":
    main()
