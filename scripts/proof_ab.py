"""Same-process A/B of prover MSM configs on the warm Spend proof.

Cross-process wall clocks on the axon tunnel drift +-10-15%, so config
decisions must come from interleaved same-process runs.  This loads the
Spend CRS once, then alternates the env-driven config between warm
proofs (the engine reads ZKTPU_MSM_HYBRID_C per dispatch) and reports
per-config medians of the device-pipeline readback and create_proof
total.

Usage: python scripts/proof_ab.py [reps-per-config]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import io
    from contextlib import redirect_stdout

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/zktpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from zcash_gpu_thesis_tpu.ffi import api as A
    from zcash_gpu_thesis_tpu.groth16 import BlsEngine, prover as P

    import examples.sapling_demo as demo

    class _Args:
        params = "params_cache"
        tpu = True
        repeat = 1

    e = BlsEngine()
    buf = io.StringIO()
    with redirect_stdout(buf):
        spend_params, output_params = demo.get_params(_Args(), e)
    A.librustzcash_init_zksnark_params(spend_params, output_params)

    rng = random.Random(1234)
    from zcash_gpu_thesis_tpu.protocol import jubjub as J

    ask, nsk = rng.randrange(J.FS), rng.randrange(J.FS)
    ak = A.librustzcash_ask_to_ak(ask.to_bytes(32, "little"))
    d = next(i.to_bytes(11, "little") for i in range(64)
             if A.librustzcash_check_diversifier(i.to_bytes(11, "little")))
    ivk = A.librustzcash_crh_ivk(
        ak, A.librustzcash_nsk_to_nk(nsk.to_bytes(32, "little")))
    pk_d = A.librustzcash_ivk_to_pkd(ivk, d)
    value = 100_000
    rcm = A.librustzcash_sapling_generate_r()
    cm = A.librustzcash_sapling_compute_cm(d, pk_d, value, rcm)
    siblings, node = [], A.librustzcash_tree_uncommitted()
    for depth in range(32):
        siblings.append(node)
        node = A.librustzcash_merkle_hash(depth, node, node)
    anchor = cm
    for depth in range(32):
        anchor = A.librustzcash_merkle_hash(depth, anchor, siblings[depth])
    witness = bytes([32])
    for s in reversed(siblings):
        witness += bytes([32]) + s
    witness += (0).to_bytes(8, "little")
    ar = rng.randrange(J.FS)

    def one_proof():
        ctx = A.librustzcash_sapling_proving_ctx_init()
        t0 = time.perf_counter()
        res = A.librustzcash_sapling_spend_proof(
            ctx, ak, nsk.to_bytes(32, "little"), d, rcm,
            ar.to_bytes(32, "little"), value, anchor, witness, rng=rng)
        assert res is not None
        wall = time.perf_counter() - t0
        tm = dict(P.last_timings)
        return wall, tm

    configs = [
        ("hybrid_c6", {"ZKTPU_MSM_HYBRID_C": "6"}),
        ("hybrid_c7", {"ZKTPU_MSM_HYBRID_C": "7"}),
    ]
    if len(sys.argv) > 2 and sys.argv[2] == "--with-nohybrid":
        configs.append(("no_hybrid", {"ZKTPU_MSM_HYBRID_WINDOWS": "0"}))

    # warm every config's executables first
    for name, env in configs:
        os.environ.update(env)
        one_proof()
        one_proof()
        for k in env:
            del os.environ[k]
        print(f"{name}: warmed", flush=True)

    results = {name: [] for name, _ in configs}
    for r in range(reps):
        for name, env in configs:
            os.environ.update(env)
            wall, tm = one_proof()
            for k in env:
                del os.environ[k]
            results[name].append(
                (tm.get("msm readback", 0), tm.get("total", 0)
                 - tm.get("synthesis", 0), wall))
    for name, rows in results.items():
        rb = sorted(x[0] for x in rows)[len(rows) // 2]
        comp = sorted(x[1] for x in rows)[len(rows) // 2]
        wl = sorted(x[2] for x in rows)[len(rows) // 2]
        print(f"{name}: readback med {rb:.3f}s  compute med {comp:.3f}s "
              f"wall med {wl:.3f}s  (n={len(rows)})", flush=True)


if __name__ == "__main__":
    main()
