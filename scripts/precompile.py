"""Pre-warm every per-shape cache so the first production proof is warm.

Cold-start cost on the axon remote-TPU path is dominated by one-time
XLA compiles (gather-heavy executables compile in minutes through the
remote-compile service; see PROGRESS r4 "Environment note").  All of it
is cacheable:

  * the persistent XLA compile cache (jax_compilation_cache_dir),
  * the compiled-R1CS structures + witness tapes (params_cache/*.npz),
  * after this script, a fresh process's first proof pays only the
    in-process device-form CRS upload.

This walks the requested circuit shapes and runs ONE full proof each
(synthetic witness, verified), which traces/compiles everything a warm
proof executes.  The reference has no cold/warm split (its first proof
is as fast as its tenth, compiled Rust + JIT'd OpenCL within seconds) —
this tool is the TPU build's answer for first-contact latency.

Usage:
  python scripts/precompile.py [--params params_cache]
                               [--circuits spend,output,sprout]
                               [--cache /tmp/zktpu_jax_cache] [--cpu]
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spend_witness_args(rng):
    from zcash_gpu_thesis_tpu.ffi import api as A
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
    return dict(ak=ak, nsk=nsk.to_bytes(32, "little"), d=d, rcm=rcm,
                ar=ar.to_bytes(32, "little"), value=value, anchor=anchor,
                witness=witness, pk_d=pk_d, ivk=ivk)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="params_cache")
    ap.add_argument("--circuits", default="spend,output,sprout")
    ap.add_argument("--cache", default="/tmp/zktpu_jax_cache")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", args.cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from zcash_gpu_thesis_tpu.ffi import api as A
    from zcash_gpu_thesis_tpu.groth16 import BlsEngine

    import examples.sapling_demo as demo

    want = set(args.circuits.split(","))
    rng = random.Random(0x5DBE6259)
    e = BlsEngine()

    class _A:
        params = args.params
        tpu = not args.cpu
        repeat = 1

    t0 = time.time()
    spend_params, output_params = demo.get_params(_A(), e)
    A.librustzcash_init_zksnark_params(spend_params, output_params)
    print(f"params loaded in {time.time()-t0:.1f}s", flush=True)

    if "spend" in want:
        w = _spend_witness_args(rng)
        ctx = A.librustzcash_sapling_proving_ctx_init()
        t0 = time.time()
        res = A.librustzcash_sapling_spend_proof(
            ctx, w["ak"], w["nsk"], w["d"], w["rcm"], w["ar"], w["value"],
            w["anchor"], w["witness"], rng=rng)
        assert res is not None
        print(f"spend shape warmed in {time.time()-t0:.1f}s", flush=True)

    if "output" in want:
        w = _spend_witness_args(rng)
        ctx = A.librustzcash_sapling_proving_ctx_init()
        esk = A.librustzcash_sapling_generate_r()
        t0 = time.time()
        res = A.librustzcash_sapling_output_proof(
            ctx, esk, w["d"], w["pk_d"], w["rcm"], 55_000, rng=rng)
        assert res is not None
        print(f"output shape warmed in {time.time()-t0:.1f}s", flush=True)

    if "sprout" in want:
        from zcash_gpu_thesis_tpu.groth16 import (prepare_verifying_key,
                                                  witness)
        from zcash_gpu_thesis_tpu.protocol import codecs, sprout as H

        witness.set_params_dir(args.params)
        path = os.path.join(args.params, "sprout-groth16.params")
        if not os.path.exists(path):
            print("sprout params missing; skipping "
                  "(generate with examples/sprout_demo.py --params)")
        else:
            t0 = time.time()
            with open(path, "rb") as f:
                sp = codecs.params_from_bytes(f.read(), check=False)
            print(f"sprout params loaded in {time.time()-t0:.1f}s",
                  flush=True)

            def rand32():
                return bytes(rng.randrange(256) for _ in range(32))

            phi, h_sig = rand32(), rand32()
            rt = H.uncommitted()
            for _ in range(A.SPROUT_TREE_DEPTH):
                rt = H.merkle_combine(rt, rt)
            sibling = H.uncommitted()
            auth = bytes([A.SPROUT_TREE_DEPTH])
            for _ in range(A.SPROUT_TREE_DEPTH):
                auth += bytes([32]) + sibling
            auth += (0).to_bytes(8, "little")
            out_pk = [H.prf_a_pk(rand32()) for _ in range(2)]
            t0 = time.time()
            proof = A.librustzcash_sprout_prove(
                sp, phi, rt, h_sig,
                rand32(), 0, rand32(), rand32(), auth,
                rand32(), 0, rand32(), rand32(), auth,
                out_pk[0], 60_000, rand32(),
                out_pk[1], 40_000, rand32(),
                100_000, 0)
            assert proof is not None
            print(f"sprout shape warmed in {time.time()-t0:.1f}s",
                  flush=True)

    print("precompile done: persistent caches hot "
          f"(XLA cache: {args.cache}; structures: {args.params})")


if __name__ == "__main__":
    main()
