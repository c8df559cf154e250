"""Host Sprout primitives vs the circuit gadgets.

The circuit (circuits/sprout.py, bit-exact to sapling-crypto sprout/* by
the shape-hash golden) is the ground truth; protocol/sprout.py recomputes
the PRFs / note commitment / merkle layer host-side, as needed for the
verifier's public inputs.  These run each small gadget on a
TestConstraintSystem and compare output bits.
"""

import random

from zcash_gpu_thesis_tpu.circuits import sprout as S
from zcash_gpu_thesis_tpu.circuits.test_cs import TestConstraintSystem
from zcash_gpu_thesis_tpu.protocol import sprout as H

rng = random.Random(0xBADA55)


def _rand(n=32):
    return bytes(rng.randrange(256) for _ in range(n))


def _bits_to_bytes(bits):
    """Boolean list (MSB-first per byte) -> bytes."""
    vals = [bool(b.get_value()) for b in bits]
    assert len(vals) % 8 == 0
    out = bytearray()
    for k in range(0, len(vals), 8):
        byte = 0
        for i in range(8):
            byte = (byte << 1) | vals[k + i]
        out.append(byte)
    return bytes(out)


def test_prfs_match_circuit():
    a_sk, rho, h_sig, phi = _rand(), _rand(), _rand(), _rand()
    cs = TestConstraintSystem()
    a_sk_b = S.witness_u252(cs, "a_sk", a_sk)
    rho_b = S.witness_u256(cs, "rho", rho)
    h_sig_b = S.witness_u256(cs, "h_sig", h_sig)
    phi_b = S.witness_u252(cs, "phi", phi)
    assert _bits_to_bytes(
        S.prf_a_pk(cs, "a_pk", a_sk_b)) == H.prf_a_pk(a_sk)
    assert _bits_to_bytes(
        S.prf_nf(cs, "nf", a_sk_b, rho_b)) == H.prf_nf(a_sk, rho)
    for nonce in (False, True):
        assert _bits_to_bytes(
            S.prf_pk(cs, f"mac{nonce}", a_sk_b, h_sig_b, nonce)
        ) == H.prf_pk(a_sk, h_sig, nonce)
        assert _bits_to_bytes(
            S.prf_rho(cs, f"rho{nonce}", phi_b, h_sig_b, nonce)
        ) == H.prf_rho(phi, h_sig, nonce)
    assert cs.is_satisfied()


def test_note_comm_matches_circuit():
    a_pk, rho, r = _rand(), _rand(), _rand()
    value = rng.randrange(1 << 64)
    cs = TestConstraintSystem()
    a_pk_b = S.witness_u256(cs, "a_pk", a_pk)
    rho_b = S.witness_u256(cs, "rho", rho)
    r_b = S.witness_u256(cs, "r", r)
    nv = S.NoteValue(cs, "value", value)
    got = _bits_to_bytes(
        S.note_comm(cs, "cm", a_pk_b, nv.bits_le(), rho_b, r_b))
    assert got == H.note_comm(a_pk, value, rho, r)
    assert cs.is_satisfied()


def test_merkle_layer_matches_circuit():
    from zcash_gpu_thesis_tpu.circuits.sha256 import sha256_block_no_padding

    l, r = _rand(), _rand()
    cs = TestConstraintSystem()
    lb = S.witness_u256(cs, "l", l)
    rb = S.witness_u256(cs, "r", r)
    got = _bits_to_bytes(
        sha256_block_no_padding(cs, "combine", lb + rb))
    assert got == H.merkle_combine(l, r)
    assert cs.is_satisfied()
