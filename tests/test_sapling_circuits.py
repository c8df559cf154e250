"""Sapling circuit regression tests.

The reference pins Spend to exactly 98,777 constraints / 8 public inputs
and Output to 7,827 / 6 (circuit/sapling/mod.rs:715,720,792,806), and
checks satisfaction plus the expected public inputs with randomized
witnesses (test_input_circuit_with_bls12_381 /
test_output_circuit_with_bls12_381).
"""

import random

import pytest

from zcash_gpu_thesis_tpu.circuits.multipack import compute_multipacking
from zcash_gpu_thesis_tpu.circuits.sapling import Output, Spend, TREE_DEPTH
from zcash_gpu_thesis_tpu.circuits.test_cs import TestConstraintSystem
from zcash_gpu_thesis_tpu.constants import R as FR
from zcash_gpu_thesis_tpu.protocol import jubjub as J
from zcash_gpu_thesis_tpu.protocol import primitives as P


def _random_witness(rng):
    value_commitment = P.ValueCommitment(
        value=rng.randrange(1, 1 << 64), randomness=rng.randrange(J.FS)
    )
    ak = J.edwards_mul(
        J.JubjubParams().generator(J.SPENDING_KEY_GENERATOR),
        rng.randrange(J.FS),
    )
    pgk = P.ProofGenerationKey(ak=ak, nsk=rng.randrange(J.FS))
    vk = pgk.into_viewing_key()
    while True:
        d = rng.randrange(1 << 88).to_bytes(11, "little")
        addr = vk.into_payment_address(d)
        if addr is not None:
            return value_commitment, pgk, vk, addr


@pytest.mark.slow
def test_spend_constraint_count_and_satisfaction():
    rng = random.Random(0x3DBE6259)
    value_commitment, pgk, vk, addr = _random_witness(rng)
    ar = rng.randrange(J.FS)
    commitment_randomness = rng.randrange(J.FS)
    auth_path = [
        (rng.randrange(FR), bool(rng.getrandbits(1)))
        for _ in range(TREE_DEPTH)
    ]

    # host-side expected values (primitives/mod.rs)
    note = addr.create_note(value_commitment.value, commitment_randomness)
    cur = note.cm()
    position = 0
    for i, (uncle, is_right) in enumerate(auth_path):
        if is_right:
            position |= 1 << i
            lhs, rhs = uncle, cur
        else:
            lhs, rhs = cur, uncle
        bits = []
        for v in (lhs, rhs):
            bits.extend(bool((v >> k) & 1) for k in range(255))
        cur = J.pedersen_hash(J.merkle_tree_personalization(i), bits)[0]
    anchor = cur

    expected_nf = note.nf(vk, position)
    rk = vk.rk(ar)
    cv = value_commitment.cm()

    cs = TestConstraintSystem()
    Spend(
        value_commitment=value_commitment,
        proof_generation_key=pgk,
        payment_address=addr,
        commitment_randomness=commitment_randomness,
        ar=ar,
        auth_path=list(auth_path),
        anchor=anchor,
    ).synthesize(cs)

    assert cs.is_satisfied(), cs.which_is_unsatisfied()
    assert cs.num_constraints() == 98777
    assert cs.num_inputs() == 8

    # expected public inputs (mod.rs:721-737)
    assert cs.get_input(1, "rk/x/input variable") == rk[0]
    assert cs.get_input(2, "rk/y/input variable") == rk[1]
    assert cs.get_input(
        3, "value commitment/commitment point/x/input variable"
    ) == cv[0]
    assert cs.get_input(
        4, "value commitment/commitment point/y/input variable"
    ) == cv[1]
    assert cs.get_input(5, "anchor/input variable") == anchor
    nf_bits = [bool((b >> i) & 1) for b in expected_nf for i in range(8)]
    packed = compute_multipacking(nf_bits)
    assert len(packed) == 2
    assert cs.get_input(6, "pack nullifier/input 0") == packed[0]
    assert cs.get_input(7, "pack nullifier/input 1") == packed[1]


@pytest.mark.slow
def test_output_constraint_count_and_satisfaction():
    rng = random.Random(0x8D313D76)
    value_commitment, pgk, vk, addr = _random_witness(rng)
    commitment_randomness = rng.randrange(J.FS)
    esk = rng.randrange(J.FS)

    cs = TestConstraintSystem()
    Output(
        value_commitment=value_commitment,
        payment_address=addr,
        commitment_randomness=commitment_randomness,
        esk=esk,
    ).synthesize(cs)

    assert cs.is_satisfied(), cs.which_is_unsatisfied()
    assert cs.num_constraints() == 7827
    assert cs.num_inputs() == 6

    cv = value_commitment.cm()
    epk = J.edwards_mul(addr.g_d(), esk)
    note = addr.create_note(value_commitment.value, commitment_randomness)
    assert cs.get_input(
        1, "value commitment/commitment point/x/input variable"
    ) == cv[0]
    assert cs.get_input(
        2, "value commitment/commitment point/y/input variable"
    ) == cv[1]
    assert cs.get_input(3, "epk/x/input variable") == epk[0]
    assert cs.get_input(4, "epk/y/input variable") == epk[1]
    assert cs.get_input(5, "commitment/input variable") == note.cm()
