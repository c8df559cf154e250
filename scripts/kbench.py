"""MSM bucket-kernel micro-benchmark: decompose + sweep variants.

Times the Pallas bucket kernel at the headline 131k-point G1 workload
(Chapter6.tex:86-96) under different (c, chunks, k_inner) configurations,
separating the bucket-accumulate kernel from the suffix/fold stages and
the host readback.  Drives the window-width / chunk sweep the reference
ran for its GPU kernels (multiexp.rs:2825's chunk sweep; Chapter7.tex's
window analysis).

Usage: python scripts/kbench.py --c 4 --chunks 16 --k 8 [--n 131071]
       python scripts/kbench.py --stage msm   # full msm_host_pallas
"""

import argparse
import json
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=4)
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--n", type=int, default=131071)
    ap.add_argument("--stage", default="all",
                    choices=["all", "bucket", "wsums", "msm"])
    ap.add_argument("--repeat", type=int, default=3)
    ns = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/zktpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from zcash_gpu_thesis_tpu.oracle import curve as O
    from zcash_gpu_thesis_tpu.ops import curve as cv
    from zcash_gpu_thesis_tpu.ops import msm as M
    from zcash_gpu_thesis_tpu.ops import msm_pallas as MP
    from zcash_gpu_thesis_tpu.ops.curve import G1

    rng = random.Random(0x5DBE6259)
    base = O.random_g1_points(rng, 64)
    pts = [base[i % 64] for i in range(ns.n)]
    scalars = [rng.randrange(O.R) for _ in range(ns.n)]
    aff = cv.g1_affine_from_ints(pts)
    digits = jnp.asarray(
        M.recode_signed(M.digits_from_ints(scalars, ns.c), ns.c))

    def timed(label, fn, sync):
        out = fn()
        sync(out)  # compile + warm
        times = []
        for _ in range(ns.repeat):
            t0 = time.perf_counter()
            sync(fn())
            times.append(time.perf_counter() - t0)
        t = min(times)
        print(json.dumps({
            "label": label, "c": ns.c, "chunks": ns.chunks, "k": ns.k,
            "n": ns.n, "t": round(t, 4),
            "equiv_131k_vs_baseline": round(0.75 / (t * 131071 / ns.n), 3),
        }))
        return t

    def sync_tree(out):
        np.asarray(jax.tree.leaves(out)[0])

    if ns.stage in ("all", "bucket"):
        timed("bucket_accumulate",
              lambda: MP.bucket_accumulate(G1, aff, digits, ns.c,
                                           ns.chunks, ns.k),
              sync_tree)
    if ns.stage in ("all", "wsums"):
        timed("window_sums",
              lambda: MP._window_sums_pallas_jit(G1, aff, digits, ns.c,
                                                 ns.chunks, ns.k),
              sync_tree)
    if ns.stage in ("all", "msm"):
        timed("msm_host_pallas",
              lambda: MP.msm_host_pallas(G1, aff, digits, ns.c,
                                         ns.chunks, ns.k),
              lambda out: None)


if __name__ == "__main__":
    main()
