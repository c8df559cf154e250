"""Full Sapling Spend + Output proving, end to end.

The production flow of the reference (librustzcash_sapling_spend_proof /
output_proof, rustzcash.rs:1375/1147) on our stack: generate the Spend
(98,777-constraint) and Output (7,827-constraint) CRS with the device
generator, build real witnesses with the host note crypto, prove through
the TPU NTT/MSM kernels, and verify with the exact host pairing —
including the consensus-side check_spend/check_output/final_check and
binding/spend-auth signatures through the FFI surface.

CRS generation is the slow part (~minutes); pass --params DIR to cache
the parameters with the byte codecs.
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_params(args, e):
    from zcash_gpu_thesis_tpu.circuits.sapling import Output, Spend
    from zcash_gpu_thesis_tpu.groth16 import generate_parameters, witness
    from zcash_gpu_thesis_tpu.protocol import codecs

    if args.params:
        # compiled-R1CS structures persist next to the params files
        witness.set_params_dir(args.params)

    rng = random.Random(0x5DBE6259)

    def gen(name, circuit):
        path = args.params and os.path.join(args.params, f"{name}.params")
        if path and os.path.exists(path):
            t0 = time.time()
            with open(path, "rb") as f:
                p = codecs.params_from_bytes(f.read(), check=False)
            print(f"{name}: loaded params in {time.time()-t0:.1f}s")
            return p
        t0 = time.time()
        p = generate_parameters(
            e, circuit,
            alpha=rng.randrange(1, e.r), beta=rng.randrange(1, e.r),
            gamma=rng.randrange(1, e.r), delta=rng.randrange(1, e.r),
            tau=rng.randrange(1, e.r),
        )
        print(f"{name}: CRS generated in {time.time()-t0:.1f}s "
              f"({len(p.a)} a-bases, {len(p.h)} h-bases)")
        if path:
            os.makedirs(args.params, exist_ok=True)
            with open(path, "wb") as f:
                f.write(codecs.params_to_bytes(p))
        return p

    spend_params = gen("sapling-spend", Spend())
    output_params = gen("sapling-output", Output())
    return spend_params, output_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--params", help="directory to cache CRS")
    ap.add_argument("--repeat", type=int, default=1,
                    help="prove the spend N times: later iterations show "
                         "the steady-state serving latency (compiled "
                         "executables + device-resident CRS)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/zktpu_jax_cache")

    from zcash_gpu_thesis_tpu.ffi import api as A
    from zcash_gpu_thesis_tpu.groth16 import BlsEngine
    from zcash_gpu_thesis_tpu.protocol import jubjub as J

    e = BlsEngine()
    spend_params, output_params = get_params(args, e)
    A.librustzcash_init_zksnark_params(spend_params, output_params)

    rng = random.Random(1234)

    # --- wallet-side key material
    ask = rng.randrange(J.FS)
    nsk = rng.randrange(J.FS)
    ak = A.librustzcash_ask_to_ak(ask.to_bytes(32, "little"))
    d = next(
        i.to_bytes(11, "little") for i in range(64)
        if A.librustzcash_check_diversifier(i.to_bytes(11, "little"))
    )
    ivk = A.librustzcash_crh_ivk(
        ak, A.librustzcash_nsk_to_nk(nsk.to_bytes(32, "little"))
    )
    pk_d = A.librustzcash_ivk_to_pkd(ivk, d)

    # --- a note in a singleton commitment tree
    value = 100_000
    rcm = A.librustzcash_sapling_generate_r()
    cm = A.librustzcash_sapling_compute_cm(d, pk_d, value, rcm)

    # build a depth-32 witness: our note at position 0, empty siblings
    cur = cm
    empty = A.librustzcash_tree_uncommitted()
    siblings = []
    node = empty
    for depth in range(32):
        siblings.append(node)
        node = A.librustzcash_merkle_hash(depth, node, node)
    anchor = cur
    for depth in range(32):
        anchor = A.librustzcash_merkle_hash(depth, anchor, siblings[depth])
    witness = bytes([32])
    for s in reversed(siblings):
        witness += bytes([32]) + s
    witness += (0).to_bytes(8, "little")

    ar = rng.randrange(J.FS)
    sighash = bytes(range(32))

    ctx = A.librustzcash_sapling_proving_ctx_init()
    for it in range(args.repeat):
        if it:
            # fresh context per iteration so binding-state stays consistent
            ctx = A.librustzcash_sapling_proving_ctx_init()
        t0 = time.time()
        res = A.librustzcash_sapling_spend_proof(
            ctx, ak, nsk.to_bytes(32, "little"), d, rcm,
            ar.to_bytes(32, "little"), value, anchor, witness, rng=rng,
        )
        assert res is not None, "spend proof failed self-check"
        cv, rk, spend_zkproof = res
        tag = "" if args.repeat == 1 else f" (iteration {it + 1})"
        print(f"SPEND proof created+self-verified in {time.time()-t0:.1f}s"
              f"{tag}")

    spend_sig = A.librustzcash_sapling_spend_sig(
        ask.to_bytes(32, "little"), ar.to_bytes(32, "little"), sighash,
        rng=rng,
    )

    # --- output to the same address
    esk = A.librustzcash_sapling_generate_r()
    rcm2 = A.librustzcash_sapling_generate_r()
    t0 = time.time()
    out_res = A.librustzcash_sapling_output_proof(
        ctx, esk, d, pk_d, rcm2, value, rng=rng
    )
    assert out_res is not None
    cv_out, output_zkproof = out_res
    print(f"OUTPUT proof created in {time.time()-t0:.1f}s")

    binding_sig = A.librustzcash_sapling_binding_sig(ctx, 0, sighash, rng=rng)
    assert binding_sig is not None, "binding signature"

    # --- consensus-side verification
    nf = A.librustzcash_sapling_compute_nf(
        d, pk_d, value, rcm, ak,
        A.librustzcash_nsk_to_nk(nsk.to_bytes(32, "little")), 0,
    )
    vctx = A.librustzcash_sapling_verification_ctx_init()
    t0 = time.time()
    ok_spend = A.librustzcash_sapling_check_spend(
        vctx, cv, anchor, nf, rk, spend_zkproof, spend_sig, sighash
    )
    cm_out = A.librustzcash_sapling_compute_cm(d, pk_d, value, rcm2)
    epk = A.librustzcash_sapling_ka_derivepublic(d, esk)
    ok_output = A.librustzcash_sapling_check_output(
        vctx, cv_out, cm_out, epk, output_zkproof
    )
    ok_final = A.librustzcash_sapling_final_check(
        vctx, 0, binding_sig, sighash
    )
    print(f"verified in {time.time()-t0:.1f}s: "
          f"spend={ok_spend} output={ok_output} final={ok_final}")
    if not (ok_spend and ok_output and ok_final):
        sys.exit(1)
    print("SAPLING SPEND+OUTPUT END-TO-END OK "
          "(98,777-constraint proof via device kernels, host pairing)")


if __name__ == "__main__":
    main()
