"""Sapling key-component golden vectors.

Parses the zcash-hackworks sapling_key_components vectors embedded in the
reference (`librustzcash/src/tests/key_components.rs`) and checks the full
derivation chain through our FFI surface: sk -> (ask, nsk, ovk) ->
(ak, nk) -> ivk -> pk_d -> note commitment.  Skipped if the reference
checkout is absent.
"""

import os
import re

import pytest

KC_RS = "/root/reference/librustzcash/librustzcash/src/tests/key_components.rs"

needs_reference = pytest.mark.skipif(
    not os.path.exists(KC_RS), reason="reference checkout not mounted"
)

FIELDS = ["sk", "ask", "nsk", "ovk", "ak", "nk", "ivk", "default_d",
          "default_pk_d", "note_r", "note_cm"]


def _load_vectors():
    src = open(KC_RS).read()
    out = []
    pat = (
        r"TestVector \{\s*"
        + r"".join(
            rf"{f}: \[(?P<{f}>[^\]]*)\],\s*" if f != "note_r" else
            rf"note_v: (?P<note_v>\d+),\s*note_r: \[(?P<note_r>[^\]]*)\],\s*"
            for f in FIELDS
            if f != "note_cm"
        )
        + r"note_cm: \[(?P<note_cm>[^\]]*)\],"
    )
    for m in re.finditer(pat, src, re.S):
        d = {}
        for f in FIELDS:
            d[f] = bytes(
                int(t, 16) for t in re.findall(r"0x([0-9a-fA-F]{2})", m.group(f))
            )
        d["note_v"] = int(m.group("note_v"))
        out.append(d)
    return out


@needs_reference
def test_key_components_goldens():
    from zcash_gpu_thesis_tpu.ffi import api as A
    from zcash_gpu_thesis_tpu.protocol import zip32 as Z

    vectors = _load_vectors()
    assert len(vectors) >= 10
    for i, tv in enumerate(vectors):
        expsk = Z.ExpandedSpendingKey.from_spending_key(tv["sk"])
        assert Z._fs_bytes(expsk.ask) == tv["ask"], i
        assert Z._fs_bytes(expsk.nsk) == tv["nsk"], i
        assert expsk.ovk == tv["ovk"], i
        ak = A.librustzcash_ask_to_ak(tv["ask"])
        nk = A.librustzcash_nsk_to_nk(tv["nsk"])
        assert ak == tv["ak"], i
        assert nk == tv["nk"], i
        ivk = A.librustzcash_crh_ivk(ak, nk)
        assert ivk == tv["ivk"], i
        assert A.librustzcash_check_diversifier(tv["default_d"]), i
        pk_d = A.librustzcash_ivk_to_pkd(ivk, tv["default_d"])
        assert pk_d == tv["default_pk_d"], i
        cm = A.librustzcash_sapling_compute_cm(
            tv["default_d"], pk_d, tv["note_v"], tv["note_r"]
        )
        assert cm == tv["note_cm"], i


SIG_RS = "/root/reference/librustzcash/librustzcash/src/tests/signatures.rs"
NOTES_RS = "/root/reference/librustzcash/librustzcash/src/tests/notes.rs"


def _arrs(block, name):
    m = re.search(rf"{name}: \[([^\]]*)\]", block, re.S)
    return bytes(int(t, 16) for t in re.findall(r"0x([0-9a-fA-F]{2})", m.group(1)))


@pytest.mark.skipif(not os.path.exists(SIG_RS), reason="reference absent")
def test_redjubjub_signature_goldens():
    """sapling_signatures vectors: randomization relations and signature
    verification (signatures.rs)."""
    from zcash_gpu_thesis_tpu.protocol import jubjub as J
    from zcash_gpu_thesis_tpu.protocol import redjubjub as RJ

    src = open(SIG_RS).read()
    blocks = [b for b in src.split("TestVector {")[1:] if "u8;" not in b[:400]]
    assert len(blocks) >= 10
    checked = 0
    for b in blocks:
        sk = int.from_bytes(_arrs(b, "sk"), "little")
        vk = _arrs(b, "vk")
        alpha = int.from_bytes(_arrs(b, "alpha"), "little")
        rsk = int.from_bytes(_arrs(b, "rsk"), "little")
        rvk = _arrs(b, "rvk")
        m = _arrs(b, "m")
        sig = _arrs(b, "sig")
        rsig = _arrs(b, "rsig")
        pub = RJ.PublicKey.from_private(RJ.PrivateKey(sk),
                                        J.SPENDING_KEY_GENERATOR)
        assert pub.write() == vk
        assert (sk + alpha) % J.FS == rsk
        rpub = pub.randomize(alpha, J.SPENDING_KEY_GENERATOR)
        assert rpub.write() == rvk
        assert pub.verify(m, sig, J.SPENDING_KEY_GENERATOR)
        assert rpub.verify(m, rsig, J.SPENDING_KEY_GENERATOR)
        assert not pub.verify(m, rsig, J.SPENDING_KEY_GENERATOR)
        checked += 1
    assert checked == len(blocks)


@pytest.mark.skipif(not os.path.exists(NOTES_RS), reason="reference absent")
def test_note_nullifier_goldens():
    """sapling_key_components note_nf vectors through compute_nf
    (notes.rs)."""
    from zcash_gpu_thesis_tpu.ffi import api as A

    src = open(NOTES_RS).read()
    blocks = [b for b in src.split("TestVector {")[1:] if "u8;" not in b[:400]]
    assert len(blocks) >= 10
    for b in blocks:
        d = _arrs(b, "default_d")
        pk_d = _arrs(b, "default_pk_d")
        v = int(re.search(r"note_v: (\d+)", b).group(1))
        r = _arrs(b, "note_r")
        nf = _arrs(b, "note_nf")
        pos = int(re.search(r"note_pos: (\d+)", b).group(1))
        ak = _arrs(b, "ak")
        nk = _arrs(b, "nk")
        got = A.librustzcash_sapling_compute_nf(d, pk_d, v, r, ak, nk, pos)
        assert got == nf
