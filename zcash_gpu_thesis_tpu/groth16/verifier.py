"""Groth16 verifier.

Re-design of ``bellman/src/groth16/verifier.rs``: ``prepare_verifying_key``
(verifier.rs:18) precomputes e(alpha, beta) and the negated gamma/delta
G2 points; ``verify_proof`` (verifier.rs:35) accumulates the public-input
combination and checks the 3-pair product of pairings against e(alpha,
beta).  All host-side (the reference never accelerated pairings either).
"""

from __future__ import annotations

from .params import Parameters, PreparedVerifyingKey, Proof, VerifyingKey


def prepare_verifying_key(engine, vk: VerifyingKey) -> PreparedVerifyingKey:
    return PreparedVerifyingKey(
        alpha_beta=engine.pairing(vk.alpha_g1, vk.beta_g2),
        neg_gamma_g2=engine.g2_neg(vk.gamma_g2),
        neg_delta_g2=engine.g2_neg(vk.delta_g2),
        ic=list(vk.ic),
    )


def verify_proof(engine, pvk: PreparedVerifyingKey, proof: Proof,
                 public_inputs) -> bool:
    """e(A, B) == e(alpha, beta) * e(acc, gamma) * e(C, delta)
    rearranged as the one-product check of verifier.rs:59-65."""
    if len(public_inputs) + 1 != len(pvk.ic):
        raise ValueError("malformed verifying key / wrong input count")
    acc = pvk.ic[0]
    for x, b in zip(public_inputs, pvk.ic[1:]):
        acc = engine.g1_add(acc, engine.g1_mul(b, int(x) % engine.r))
    lhs = engine.pairing_product(
        [
            (proof.a, proof.b),
            (acc, pvk.neg_gamma_g2),
            (proof.c, pvk.neg_delta_g2),
        ]
    )
    return engine.gt_eq(lhs, pvk.alpha_beta)
