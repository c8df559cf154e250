"""Full-stack Groth16 smoke test: CRS -> prove -> verify on BLS12-381.

Generates parameters for a toy circuit with our own generator (device
NTT + batched fixed-base), proves through the device MSM kernels, and
verifies with the exact host pairing — the end-to-end slice of
SURVEY.md §7 step 6.

Runs on the CPU backend by default (pass --tpu to use the real chip).
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class MultiplyDemo:
    """Prove knowledge of factors x*y = z (z public)."""

    def __init__(self, x, y):
        self.x, self.y = x, y

    def synthesize(self, cs):
        from zcash_gpu_thesis_tpu.groth16 import LinearCombination

        x = cs.alloc("x", lambda: self.x)
        y = cs.alloc("y", lambda: self.y)
        z = cs.alloc_input("z", lambda: None if None in (self.x, self.y)
                           else self.x * self.y)
        cs.enforce(
            "x*y=z",
            LinearCombination([(x, 1)]),
            LinearCombination([(y, 1)]),
            LinearCombination([(z, 1)]),
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true", help="run on the TPU chip")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/zktpu_jax_cache")

    from zcash_gpu_thesis_tpu.groth16 import (BlsEngine, create_proof,
                                              generate_parameters,
                                              prepare_verifying_key,
                                              verify_proof)
    from zcash_gpu_thesis_tpu.protocol import codecs

    rng = random.Random(0x5DBE6259)
    e = BlsEngine()

    t0 = time.time()
    params = generate_parameters(
        e, MultiplyDemo(None, None),
        alpha=rng.randrange(1, e.r), beta=rng.randrange(1, e.r),
        gamma=rng.randrange(1, e.r), delta=rng.randrange(1, e.r),
        tau=rng.randrange(1, e.r),
    )
    print(f"CRS generated in {time.time()-t0:.1f}s "
          f"({len(params.a)} a-bases, {len(params.h)} h-bases)")

    pvk = prepare_verifying_key(e, params.vk)
    x, y = 7, 191
    t0 = time.time()
    proof = create_proof(
        e, MultiplyDemo(x, y), params,
        r=rng.randrange(e.r), s=rng.randrange(e.r),
    )
    print(f"proof created in {time.time()-t0:.1f}s")

    wire = codecs.proof_to_bytes(proof)
    assert len(wire) == 192
    proof2 = codecs.proof_from_bytes(wire)

    t0 = time.time()
    ok = verify_proof(e, pvk, proof2, [x * y])
    bad = verify_proof(e, pvk, proof2, [x * y + 1])
    print(f"verified in {time.time()-t0:.1f}s: valid={ok} forged={bad}")
    if not ok or bad:
        sys.exit(1)
    print("END-TO-END PROOF OK (192-byte wire proof, host pairing verify)")


if __name__ == "__main__":
    main()
