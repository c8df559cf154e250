"""FFI-surface tests (librustzcash entry-point parity).

Mirrors the reference's FFI/protocol test tiers: key-derivation round
trips, note commitment/nullifier consistency with the primitives layer,
equihash golden solutions (equihash.rs test_cases), zip32 golden
diversifier (zip32 lib.rs default_address), merkle hash vs host pedersen.
"""

import random

import pytest

from zcash_gpu_thesis_tpu.ffi import api as F
from zcash_gpu_thesis_tpu.protocol import equihash
from zcash_gpu_thesis_tpu.protocol import jubjub as J
from zcash_gpu_thesis_tpu.protocol import primitives as P


def test_key_derivation_chain():
    rng = random.Random(31)
    ask = (rng.randrange(J.FS)).to_bytes(32, "little")
    nsk = (rng.randrange(J.FS)).to_bytes(32, "little")
    ak = F.librustzcash_ask_to_ak(ask)
    nk = F.librustzcash_nsk_to_nk(nsk)
    ivk = F.librustzcash_crh_ivk(ak, nk)
    assert int.from_bytes(ivk, "little") < 1 << 251
    # find a diversifier, derive pk_d
    d = None
    i = 0
    while d is None:
        cand = i.to_bytes(11, "little")
        if F.librustzcash_check_diversifier(cand):
            d = cand
        i += 1
    pk_d = F.librustzcash_ivk_to_pkd(ivk, d)
    assert pk_d is not None
    # matches the primitives layer
    akp, nkp = J.point_read(ak), J.point_read(nk)
    vk = P.ViewingKey(akp, nkp)
    addr = vk.into_payment_address(d)
    assert J.point_write(addr.pk_d) == pk_d


def test_note_cm_nf_roundtrip():
    rng = random.Random(32)
    ask = (rng.randrange(J.FS)).to_bytes(32, "little")
    nsk = (rng.randrange(J.FS)).to_bytes(32, "little")
    ak = F.librustzcash_ask_to_ak(ask)
    nk = F.librustzcash_nsk_to_nk(nsk)
    ivk = F.librustzcash_crh_ivk(ak, nk)
    d = next(
        i.to_bytes(11, "little") for i in range(64)
        if F.librustzcash_check_diversifier(i.to_bytes(11, "little"))
    )
    pk_d = F.librustzcash_ivk_to_pkd(ivk, d)
    r = F.librustzcash_sapling_generate_r()
    cm = F.librustzcash_sapling_compute_cm(d, pk_d, 1000, r)
    assert cm is not None
    nf = F.librustzcash_sapling_compute_nf(d, pk_d, 1000, r, ak, nk, 7)
    assert nf is not None and len(nf) == 32
    # consistent with primitives
    note = P.Note(1000, P.diversifier_g_d(d), J.point_read(pk_d),
                  int.from_bytes(r, "little"))
    assert F._read_fr(cm) == note.cm()


def test_ka_agree_symmetry():
    rng = random.Random(33)
    esk = (rng.randrange(J.FS)).to_bytes(32, "little")
    sk2 = (rng.randrange(J.FS)).to_bytes(32, "little")
    g = J.JubjubParams().generator(J.SPENDING_KEY_GENERATOR)
    p1 = J.point_write(J.edwards_mul(g, int.from_bytes(esk, "little")))
    p2 = J.point_write(J.edwards_mul(g, int.from_bytes(sk2, "little")))
    s1 = F.librustzcash_sapling_ka_agree(p2, esk)
    s2 = F.librustzcash_sapling_ka_agree(p1, sk2)
    assert s1 == s2 is not None


def test_merkle_hash_and_uncommitted():
    assert F.librustzcash_tree_uncommitted() == (1).to_bytes(32, "little")
    rng = random.Random(34)
    a = (rng.randrange(1 << 254)).to_bytes(32, "little")
    b = (rng.randrange(1 << 254)).to_bytes(32, "little")
    h = F.librustzcash_merkle_hash(3, a, b)
    av, bv = int.from_bytes(a, "little"), int.from_bytes(b, "little")
    bits = [bool((av >> i) & 1) for i in range(255)]
    bits += [bool((bv >> i) & 1) for i in range(255)]
    want = J.pedersen_hash(J.merkle_tree_personalization(3), bits)[0]
    assert int.from_bytes(h, "little") == want


def test_spend_sig():
    rng = random.Random(35)
    ask = rng.randrange(J.FS)
    ar = rng.randrange(J.FS)
    sighash = bytes(range(32))
    sig = F.librustzcash_sapling_spend_sig(
        ask.to_bytes(32, "little"), ar.to_bytes(32, "little"), sighash,
        rng=rng,
    )
    assert sig is not None
    # verify with randomized public key, as the consensus check does
    from zcash_gpu_thesis_tpu.protocol import redjubjub as RJ

    rk = RJ.PublicKey.from_private(
        RJ.PrivateKey(ask).randomize(ar), J.SPENDING_KEY_GENERATOR
    )
    assert rk.verify(rk.write() + sighash, sig, J.SPENDING_KEY_GENERATOR)


def test_equihash_golden():
    """equihash.rs equihash_test_cases (96,5 vectors, index form)."""
    input_ = b"block header"
    nonce = bytes(32)
    indices = [
        976, 126621, 100174, 123328, 38477, 105390, 38834, 90500, 6411,
        116489, 51107, 129167, 25557, 92292, 38525, 56514, 1110, 98024,
        15426, 74455, 3185, 84007, 24328, 36473, 17427, 129451, 27556,
        119967, 31704, 62448, 110460, 117894,
    ]
    p = equihash.Params(96, 5)
    state = equihash._initialise_state(96, 5, p.hash_output)
    state.update(input_)
    state.update(nonce)
    root = equihash._tree_validator(p, state, indices)
    assert root is not None and root.is_zero(p.collision_byte_length)
    # reordering breaks it
    bad = list(indices)
    bad[0], bad[1] = bad[1], bad[0]
    assert equihash._tree_validator(p, state, bad) is None


def test_zip32_golden():
    seed = bytes(32)
    xsk = F.librustzcash_zip32_xsk_master(seed)
    assert len(xsk) == 169
    child = F.librustzcash_zip32_xsk_derive(xsk, 5 + (1 << 31))
    assert len(child) == 169
    from zcash_gpu_thesis_tpu.protocol import zip32 as Z

    xfvk = Z.ExtendedFullViewingKey.from_xsk(
        Z.ExtendedSpendingKey.from_bytes(xsk)
    ).to_bytes()
    res = F.librustzcash_zip32_xfvk_address(xfvk, bytes(11))
    assert res is not None
    j_ret, addr = res
    assert j_ret == bytes(11)
    assert list(addr[:11]) == [59, 246, 250, 31, 131, 191, 69, 99, 200,
                               167, 19]
    # non-hardened xfvk derivation agrees with xsk-side derivation
    c1 = F.librustzcash_zip32_xfvk_derive(xfvk, 7)
    c2 = Z.ExtendedFullViewingKey.from_xsk(
        Z.ExtendedSpendingKey.from_bytes(xsk).derive_child(7)
    ).to_bytes()
    assert c1 == c2
