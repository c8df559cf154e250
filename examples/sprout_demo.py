"""Full Sprout JoinSplit proving, end to end — the reference's biggest
circuit (1,989,085 constraints, sprout/mod.rs:465) through the production
stack: CRS from the device generator (comb-table fixed base), witness via
the host Sprout primitives (protocol/sprout.py), proof through the TPU
NTT/MSM kernels via ``librustzcash_sprout_prove`` (rustzcash.rs:945-1090),
verification with the exact host pairing via ``librustzcash_sprout_verify``
(rustzcash.rs:1093-1139).

The JoinSplit spends two dummy notes (value 0 — the circuit's
conditionally-enforced merkle root check is off for them, exactly how
zcash funds a JoinSplit from transparent value) and vpub_old into two
shielded outputs.

CRS generation is the slow part (tens of minutes at 2^21); pass
--params DIR to cache it with the byte codecs.
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_params(args, e):
    from zcash_gpu_thesis_tpu.circuits.sprout import JoinSplit
    from zcash_gpu_thesis_tpu.groth16 import generate_parameters, witness
    from zcash_gpu_thesis_tpu.protocol import codecs

    if args.params:
        # compiled-R1CS structures persist next to the params files
        witness.set_params_dir(args.params)

    rng = random.Random(0x5DBE6259)
    path = args.params and os.path.join(args.params,
                                        "sprout-groth16.params")
    if path and os.path.exists(path):
        t0 = time.time()
        with open(path, "rb") as f:
            p = codecs.params_from_bytes(f.read(), check=False)
        print(f"sprout: loaded params in {time.time()-t0:.1f}s")
        return p
    t0 = time.time()
    p = generate_parameters(
        e, JoinSplit(),
        alpha=rng.randrange(1, e.r), beta=rng.randrange(1, e.r),
        gamma=rng.randrange(1, e.r), delta=rng.randrange(1, e.r),
        tau=rng.randrange(1, e.r),
    )
    print(f"sprout: CRS generated in {time.time()-t0:.1f}s "
          f"({len(p.a)} a-bases, {len(p.h)} h-bases)")
    if path:
        os.makedirs(args.params, exist_ok=True)
        t0 = time.time()
        with open(path, "wb") as f:
            f.write(codecs.params_to_bytes(p))
        print(f"sprout: params cached in {time.time()-t0:.1f}s")
    return p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--params", help="directory to cache CRS")
    ap.add_argument("--repeat", type=int, default=1,
                    help="prove N times; later proofs are the WARM "
                    "numbers (cached CRS device form, compiled R1CS, "
                    "compiled executables)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/zktpu_jax_cache")

    from zcash_gpu_thesis_tpu.ffi import api as A
    from zcash_gpu_thesis_tpu.groth16 import (BlsEngine,
                                              prepare_verifying_key)
    from zcash_gpu_thesis_tpu.protocol import sprout as H

    e = BlsEngine()
    params = get_params(args, e)
    pvk = prepare_verifying_key(e, params.vk)

    rng = random.Random(1234)

    def rand32():
        return bytes(rng.randrange(256) for _ in range(32))

    # two dummy inputs (value 0): merkle root check is conditionally off
    phi, h_sig = rand32(), rand32()
    rt = H.uncommitted()
    for _ in range(A.SPROUT_TREE_DEPTH):
        rt = H.merkle_combine(rt, rt)  # empty root at depth 29
    in_sk = [rand32(), rand32()]
    in_rho = [rand32(), rand32()]
    in_r = [rand32(), rand32()]
    sibling = H.uncommitted()
    auth = bytes([A.SPROUT_TREE_DEPTH])
    for _ in range(A.SPROUT_TREE_DEPTH):
        auth += bytes([32]) + sibling
    auth += (0).to_bytes(8, "little")

    # two real outputs funded by vpub_old
    out_sk = [rand32(), rand32()]
    out_pk = [H.prf_a_pk(sk) for sk in out_sk]
    out_r = [rand32(), rand32()]
    out_value = [60_000, 40_000]
    vpub_old, vpub_new = sum(out_value), 0

    from zcash_gpu_thesis_tpu.groth16 import prover as P2

    for it in range(max(args.repeat, 1)):
        t0 = time.time()
        proof = A.librustzcash_sprout_prove(
            params, phi, rt, h_sig,
            in_sk[0], 0, in_rho[0], in_r[0], auth,
            in_sk[1], 0, in_rho[1], in_r[1], auth,
            out_pk[0], out_value[0], out_r[0],
            out_pk[1], out_value[1], out_r[1],
            vpub_old, vpub_new, rng=rng,
        )
        t_prove = time.time() - t0
        tag = "cold" if it == 0 else "warm"
        split = {k: round(v, 3) for k, v in P2.last_timings.items()}
        print(f"sprout: {tag} proof created in {t_prove:.1f}s "
              f"({len(proof)} bytes); phases: {split}")

    # public inputs recomputed host-side (protocol/sprout.py)
    nf = [H.prf_nf(in_sk[i], in_rho[i]) for i in range(2)]
    mac = [H.prf_pk(in_sk[i], h_sig, i == 1) for i in range(2)]
    out_rho = [H.prf_rho(phi, h_sig, i == 1) for i in range(2)]
    cm = [H.note_comm(out_pk[i], out_value[i], out_rho[i], out_r[i])
          for i in range(2)]

    t0 = time.time()
    ok = A.librustzcash_sprout_verify(
        pvk, proof, rt, h_sig, mac[0], mac[1], nf[0], nf[1],
        cm[0], cm[1], vpub_old, vpub_new,
    )
    print(f"sprout: verify={ok} in {time.time()-t0:.2f}s")
    bad = A.librustzcash_sprout_verify(
        pvk, proof, rt, h_sig, mac[0], mac[1], nf[0], nf[1],
        cm[0], cm[1], vpub_old + 1, vpub_new,
    )
    print(f"sprout: tampered verify={bad} (want False)")
    assert ok and not bad
    print("sprout joinsplit end-to-end: OK")


if __name__ == "__main__":
    main()
