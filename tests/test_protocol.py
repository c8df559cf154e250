"""Protocol-layer tests: Jubjub, group hashes, Pedersen hash, RedJubjub,
note/key primitives.

Golden values come from the reference's own test suite
(`sapling-crypto/src/jubjub/mod.rs` test_jubjub_bls12) and from structural
laws (curve membership, prime order, birational equivalence, signature
round trips) mirroring `jubjub/tests.rs` and `redjubjub.rs` tests.
"""

import random

import pytest

from zcash_gpu_thesis_tpu.protocol import jubjub as J
from zcash_gpu_thesis_tpu.protocol import primitives as P
from zcash_gpu_thesis_tpu.protocol import redjubjub as RJ


@pytest.fixture(scope="module")
def params():
    return J.JubjubParams()


def test_golden_point_read():
    """jubjub/mod.rs test_jubjub_bls12 golden: read == get_for_y."""
    test_repr = bytes.fromhex(
        "9d12b88b08dcbef8a11ee0712d94cb236ee2f4ca17317075bfafc82ce3139d31"
    )
    p = J.point_read(test_repr)
    q = J.get_for_y(
        22440861827555040311190986994816762244378363690614952020532787748720529117853,
        False,
    )
    assert p is not None and p == q
    assert J.on_curve(p)


def test_edwards_group_laws(params):
    g = params.pedersen_hash_generators[0]
    h = params.pedersen_hash_generators[1]
    assert J.edwards_add(g, J.ZERO) == g
    assert J.edwards_add(g, J.edwards_neg(g)) == J.ZERO
    assert J.edwards_add(g, h) == J.edwards_add(h, g)
    assert J.edwards_mul(g, 5) == J.edwards_add(
        J.edwards_mul(g, 2), J.edwards_mul(g, 3)
    )
    # order: s * g == 0, cofactor-cleared
    assert J.edwards_mul(g, J.FS) == J.ZERO


def test_generators(params):
    gens = params.pedersen_hash_generators + params.fixed_base_generators
    assert len(gens) == 11
    assert len(set(gens)) == 11  # no duplicates (mod.rs:258-268)
    for g in gens:
        assert J.on_curve(g)
        assert J.edwards_mul(g, J.FS) == J.ZERO
        assert g != J.ZERO


def test_montgomery_equivalence(params):
    g = params.fixed_base_generators[J.SPENDING_KEY_GENERATOR]
    m = J.montgomery_from_edwards(g)
    assert J.montgomery_on_curve(m)
    assert J.edwards_from_montgomery(m) == g
    g2 = J.edwards_add(g, g)
    assert J.montgomery_add(m, m) == J.montgomery_from_edwards(g2)
    # order-2 point mapping
    assert J.montgomery_from_edwards((0, J.FR - 1)) == (0, 0)
    assert J.edwards_from_montgomery((0, 0)) == (0, J.FR - 1)


def test_point_codec_roundtrip(params):
    rng = random.Random(3)
    for g in params.pedersen_hash_generators[:3]:
        p = J.edwards_mul(g, rng.randrange(J.FS))
        assert J.point_read(J.point_write(p)) == p


def test_circuit_generator_tables(params):
    # pedersen: 5 segments x 63 chunks x 4 montgomery multiples
    pcg = params.pedersen_circuit_generators
    assert len(pcg) == 5
    assert all(len(w) == 63 for w in pcg)
    g0 = params.pedersen_hash_generators[0]
    assert pcg[0][0][0] == J.montgomery_from_edwards(g0)
    assert pcg[0][0][3] == J.montgomery_from_edwards(J.edwards_mul(g0, 4))
    # second window base is 16*g
    assert pcg[0][1][0] == J.montgomery_from_edwards(J.edwards_mul(g0, 16))
    # fixed-base: 6 generators x 84 windows x 8 edwards multiples
    fbc = params.fixed_base_circuit_generators
    assert len(fbc) == 6
    assert all(len(w) == 84 for w in fbc)
    gk = params.fixed_base_generators[0]
    assert fbc[0][0][0] == (0, 1)
    assert fbc[0][0][7] == J.edwards_mul(gk, 7)
    assert fbc[0][1][1] == J.edwards_mul(gk, 8)


def test_pedersen_hash_structure(params):
    # > 63*3 bits forces a second segment/generator
    rng = random.Random(4)
    bits = [bool(rng.getrandbits(1)) for _ in range(200)]
    h = J.pedersen_hash(J.note_commitment_personalization(), bits)
    assert J.on_curve(h)
    # deterministic
    assert h == J.pedersen_hash(J.note_commitment_personalization(), bits)
    # differs on a single bit flip
    bits2 = list(bits)
    bits2[100] = not bits2[100]
    assert h != J.pedersen_hash(J.note_commitment_personalization(), bits2)


def test_redjubjub_sign_verify():
    rng = random.Random(5)
    sk = RJ.PrivateKey(rng.randrange(J.FS))
    vk = RJ.PublicKey.from_private(sk, J.SPENDING_KEY_GENERATOR)
    msg = b"Foo bar"
    sig = sk.sign(msg, J.SPENDING_KEY_GENERATOR, t=bytes(80))
    assert vk.verify(msg, sig, J.SPENDING_KEY_GENERATOR)
    assert not vk.verify(b"Foo baz", sig, J.SPENDING_KEY_GENERATOR)
    # randomized keys still verify (redjubjub.rs randomization tests)
    alpha = rng.randrange(J.FS)
    rsk = sk.randomize(alpha)
    rvk = vk.randomize(alpha, J.SPENDING_KEY_GENERATOR)
    sig2 = rsk.sign(msg, J.SPENDING_KEY_GENERATOR, t=b"\x01" * 80)
    assert rvk.verify(msg, sig2, J.SPENDING_KEY_GENERATOR)
    assert not vk.verify(msg, sig2, J.SPENDING_KEY_GENERATOR)
    # batch
    assert RJ.batch_verify(
        [(vk, msg, sig), (rvk, msg, sig2)], J.SPENDING_KEY_GENERATOR
    )
    assert not RJ.batch_verify(
        [(vk, msg, sig2), (rvk, msg, sig)], J.SPENDING_KEY_GENERATOR
    )


def test_note_and_keys():
    rng = random.Random(6)
    ak = J.edwards_mul(
        J.JubjubParams().generator(J.SPENDING_KEY_GENERATOR),
        rng.randrange(J.FS),
    )
    pgk = P.ProofGenerationKey(ak=ak, nsk=rng.randrange(J.FS))
    vk = pgk.into_viewing_key()
    assert J.on_curve(vk.nk)
    ivk = vk.ivk()
    assert ivk < 1 << 251
    # find a valid diversifier
    d = None
    for i in range(32):
        cand = i.to_bytes(11, "little")
        if P.diversifier_g_d(cand) is not None:
            d = cand
            break
    assert d is not None
    addr = vk.into_payment_address(d)
    assert addr is not None
    note = addr.create_note(value=10, randomness=rng.randrange(J.FS))
    cm = note.cm()
    assert 0 <= cm < J.FR
    nf = note.nf(vk, position=42)
    assert len(nf) == 32
    # commitment changes with value/randomness
    note2 = addr.create_note(value=11, randomness=note.r)
    assert note2.cm() != cm
    # value commitment homomorphism: cv(v1,r1) + cv(v2,r2) = cv(v1+v2,r1+r2)
    v1 = P.ValueCommitment(3, 17)
    v2 = P.ValueCommitment(4, 23)
    v3 = P.ValueCommitment(7, 40)
    assert J.edwards_add(v1.cm(), v2.cm()) == v3.cm()


def test_wnaf():
    from zcash_gpu_thesis_tpu.oracle import curve as O
    from zcash_gpu_thesis_tpu.utils.wnaf import wnaf_exp, wnaf_form

    rng = random.Random(61)
    for k in [0, 1, 2, 3, 12345, O.R - 1, rng.randrange(O.R)]:
        # digit reconstruction
        digits = wnaf_form(k, 4)
        assert sum(d << i for i, d in enumerate(digits)) == k
        assert all(d == 0 or d % 2 for d in digits)
        if k:
            got = wnaf_exp(
                O.g1_add, lambda p: (p[0], (-p[1]) % O.Q), None,
                O.G1_GEN, k, window=4,
            )
            assert got == O.g1_mul(O.G1_GEN, k), k


def test_fixtures_roundtrip(tmp_path):
    import numpy as np

    from zcash_gpu_thesis_tpu.ops import field as F
    from zcash_gpu_thesis_tpu.oracle import curve as O
    from zcash_gpu_thesis_tpu.utils import fixtures
    from zcash_gpu_thesis_tpu.utils.limbs import limbs_to_ints_fast

    path = str(tmp_path / "fx.bin")
    fixtures.generate(path, 20, base_points=4)
    x_l, y_l, s_l = fixtures.load(path)
    xs = limbs_to_ints_fast(x_l)
    ys = limbs_to_ints_fast(y_l)
    ss = limbs_to_ints_fast(s_l)
    # deterministic: same seed -> same stream
    rng = fixtures.XorShift128()
    pool = [rng.fr() for _ in range(4)]
    for i in range(20):
        assert O.g1_on_curve((xs[i], ys[i]))
        assert ss[i] == rng.fr()
        assert (xs[i], ys[i]) == O.g1_mul(O.G1_GEN, pool[i % 4])
    # limit works
    x2, _, _ = fixtures.load(path, limit=5)
    assert x2.shape[0] == 5
