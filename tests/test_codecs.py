"""Point/proof/params codec tests.

Mirrors the reference's codec test strategy (`pairing/src/bls12_381/tests/
mod.rs` driving the .dat golden vectors + curve_tests ser/de round trips,
ec.rs:646-925 validation rules): round trips, flag handling, malformed
encodings, and subgroup rejection.
"""

import random

import pytest

from zcash_gpu_thesis_tpu.constants import Q, R
from zcash_gpu_thesis_tpu.groth16.params import Proof
from zcash_gpu_thesis_tpu.oracle import curve as O
from zcash_gpu_thesis_tpu.protocol import codecs as C


@pytest.fixture(scope="module")
def g1pts():
    rng = random.Random(11)
    return O.random_g1_points(rng, 4) + [None]


@pytest.fixture(scope="module")
def g2pts():
    rng = random.Random(12)
    return O.random_g2_points(rng, 3) + [None]


def test_g1_roundtrips(g1pts):
    for p in g1pts:
        b = C.g1_compress(p)
        assert len(b) == 48 and (b[0] & 0x80)
        assert C.g1_uncompress(b) == p
        u = C.g1_serialize(p)
        assert len(u) == 96
        assert C.g1_deserialize(u) == p


def test_g2_roundtrips(g2pts):
    for p in g2pts:
        b = C.g2_compress(p)
        assert len(b) == 96 and (b[0] & 0x80)
        assert C.g2_uncompress(b) == p
        u = C.g2_serialize(p)
        assert len(u) == 192
        assert C.g2_deserialize(u) == p


def test_g1_sign_flag(g1pts):
    p = g1pts[0]
    neg = (p[0], (Q - p[1]) % Q)
    bp, bn = C.g1_compress(p), C.g1_compress(neg)
    assert bp[1:] == bn[1:]
    assert (bp[0] ^ bn[0]) == 0x20
    assert C.g1_uncompress(bn) == neg


def test_malformed_rejects(g1pts):
    with pytest.raises(C.CodecError):
        C.g1_uncompress(b"\x00" * 48)  # compressed flag missing
    with pytest.raises(C.CodecError):
        C.g1_deserialize(C.g1_compress(g1pts[0]) + b"\x00" * 48)
    # x >= q
    bad = bytearray(C.g1_compress(g1pts[0]))
    badx = (0x1F << 376) | int.from_bytes(bytes(bad[1:]), "big")
    with pytest.raises(C.CodecError):
        C.g1_uncompress(bytes([bad[0] | 0x1F]) + bad[1:])
    # malformed infinity with trailing garbage
    inf = bytearray(C.g1_compress(None))
    inf[5] = 1
    with pytest.raises(C.CodecError):
        C.g1_uncompress(bytes(inf))


def test_subgroup_check():
    # find an on-curve x whose point is (almost surely) not in the
    # r-order subgroup — must be rejected with check=True
    x = 0
    while True:
        x += 1
        y = C._sqrt_fq((x * x * x + 4) % Q)
        if y is None:
            continue
        if not C._in_g1_subgroup((x, y)):
            break
    b = C.g1_compress((x, y))
    with pytest.raises(C.CodecError):
        C.g1_uncompress(b, check=True)
    assert C.g1_uncompress(b, check=False) == (x, y)


def test_fq2_sqrt():
    rng = random.Random(13)
    for _ in range(8):
        a = (rng.randrange(Q), rng.randrange(Q))
        sq = C._f2mul(a, a)
        r = C._sqrt_fq2(sq)
        assert r is not None
        assert C._f2mul(r, r) == sq


def test_proof_roundtrip(g1pts, g2pts):
    proof = Proof(a=g1pts[0], b=g2pts[0], c=g1pts[1])
    b = C.proof_to_bytes(proof)
    assert len(b) == 192  # the zcashd wire size (mod.rs:567)
    back = C.proof_from_bytes(b)
    assert (back.a, back.b, back.c) == (proof.a, proof.b, proof.c)


def test_params_roundtrip(g1pts, g2pts):
    from zcash_gpu_thesis_tpu.groth16.params import Parameters, VerifyingKey

    vk = VerifyingKey(
        alpha_g1=g1pts[0], beta_g1=g1pts[1], beta_g2=g2pts[0],
        gamma_g2=g2pts[1], delta_g1=g1pts[2], delta_g2=g2pts[2],
        ic=[g1pts[3], g1pts[0]],
    )
    params = Parameters(
        vk=vk, h=[g1pts[0], g1pts[1]], l=[g1pts[2]],
        a=[g1pts[0], None], b_g1=[g1pts[1], g1pts[3]], b_g2=[g2pts[0], None],
        num_inputs=2, num_aux=1,
    )
    b = C.params_to_bytes(params)
    back = C.params_from_bytes(b)
    assert back.vk == vk
    assert back.h == params.h and back.l == params.l
    assert back.a == params.a
    assert back.b_g1 == params.b_g1 and back.b_g2 == params.b_g2
    assert (back.num_inputs, back.num_aux) == (2, 1)
