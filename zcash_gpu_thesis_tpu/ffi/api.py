"""librustzcash-compatible API surface.

Re-design of the 34 C entry points in ``librustzcash/src/rustzcash.rs``
(header ``include/librustzcash.h``), as python functions over ``bytes``
with the same wire formats: 32-byte LE field elements, 32-byte Jubjub
point encodings, 11-byte diversifiers, 192-byte Groth16 proofs, 64-byte
RedJubjub signatures.  The heavy proving work routes through the TPU
Groth16 engine; a C ABI shim over these functions lives in ``native/``.

Booleans are returned where the reference returns bool; invalid inputs
return False/None rather than raising, matching the FFI contract.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

from ..constants import R as FR_MOD
from ..groth16 import (create_proof, prepare_verifying_key, verify_proof)
from ..groth16.params import Proof
from ..protocol import codecs, equihash
from ..protocol import jubjub as J
from ..protocol import primitives as P
from ..protocol import redjubjub as RJ
from ..circuits.multipack import bytes_to_bits_le, compute_multipacking

GROTH_PROOF_SIZE = 48 + 96 + 48
SAPLING_TREE_DEPTH = 32


# -- scalar / point codecs (rustzcash.rs read_le/read_fs/write_le) -----------


def _read_fr(b: bytes) -> Optional[int]:
    x = int.from_bytes(b, "little")
    return x if x < FR_MOD else None


def _read_fs(b: bytes) -> Optional[int]:
    x = int.from_bytes(b, "little")
    return x if x < J.FS else None


def _write_fr(x: int) -> bytes:
    return (x % FR_MOD).to_bytes(32, "little")


def _is_small_order(p) -> bool:
    return J.edwards_mul(p, 8) == J.ZERO


def _read_point_prime_order(b: bytes):
    p = J.point_read(b)
    if p is None:
        return None
    if J.edwards_mul(p, J.FS) != J.ZERO:
        return None
    return p


# -- parameter state (librustzcash_init_zksnark_params) ----------------------


class _Globals:
    spend_params = None
    spend_vk = None
    output_params = None
    output_vk = None
    sprout_vk = None


_G = _Globals()


def _load_params_checked(path, expected_hash):
    """Read a params file through the blake2b HashReader and (optionally)
    check the stream digest, as rustzcash.rs:220-263 does for the
    sapling-spend/output.params files."""
    from ..protocol.hashreader import HashReader

    with open(path, "rb") as f:
        hr = HashReader(f)
        data = hr.read()
    if expected_hash is not None and hr.into_hash() != expected_hash:
        raise ValueError(f"params file hash mismatch: {path}")
    # compiled-R1CS structures persist next to the params files
    from ..groth16 import witness as _witness

    _witness.set_params_dir(os.path.dirname(os.path.abspath(path)))
    return codecs.params_from_bytes(data)


def librustzcash_init_zksnark_params(spend_params, output_params,
                                     sprout_vk=None, spend_hash=None,
                                     output_hash=None):
    """Install proving parameters (rustzcash.rs:131-283).  Takes
    ``groth16.Parameters`` objects (or file paths to our codec format)
    instead of the bellman param files; paths are read through the
    blake2b HashReader with optional expected-digest checks."""
    from ..groth16 import BlsEngine

    e = BlsEngine()
    if isinstance(spend_params, (str, bytes)) and os.path.exists(spend_params):
        spend_params = _load_params_checked(spend_params, spend_hash)
    if isinstance(output_params, (str, bytes)) and os.path.exists(output_params):
        output_params = _load_params_checked(output_params, output_hash)
    _G.spend_params = spend_params
    _G.output_params = output_params
    _G.spend_vk = prepare_verifying_key(e, spend_params.vk)
    _G.output_vk = prepare_verifying_key(e, output_params.vk)
    if sprout_vk is not None:
        _G.sprout_vk = prepare_verifying_key(e, sprout_vk)


# -- merkle / note crypto ----------------------------------------------------


def librustzcash_tree_uncommitted() -> bytes:
    return _write_fr(P.Note.uncommitted())


def librustzcash_merkle_hash(depth: int, a: bytes, b: bytes) -> bytes:
    """Pedersen merkle combine (rustzcash.rs:295-339): 255 LE bits of
    each child."""
    av = int.from_bytes(a, "little")
    bv = int.from_bytes(b, "little")
    bits = [bool((av >> i) & 1) for i in range(255)]
    bits += [bool((bv >> i) & 1) for i in range(255)]
    h = J.pedersen_hash(J.merkle_tree_personalization(depth), bits)
    return _write_fr(h[0])


def librustzcash_to_scalar(input64: bytes) -> bytes:
    assert len(input64) == 64
    return (int.from_bytes(input64, "little") % J.FS).to_bytes(32, "little")


def librustzcash_ask_to_ak(ask: bytes) -> bytes:
    s = int.from_bytes(ask, "little") % J.FS
    ak = J.edwards_mul(J.JubjubParams().generator(J.SPENDING_KEY_GENERATOR), s)
    return J.point_write(ak)


def librustzcash_nsk_to_nk(nsk: bytes) -> bytes:
    s = int.from_bytes(nsk, "little") % J.FS
    nk = J.edwards_mul(J.JubjubParams().generator(J.PROOF_GENERATION_KEY), s)
    return J.point_write(nk)


def librustzcash_crh_ivk(ak: bytes, nk: bytes) -> bytes:
    h = hashlib.blake2s(person=J.CRH_IVK_PERSONALIZATION)
    h.update(ak)
    h.update(nk)
    d = bytearray(h.digest())
    d[31] &= 0b0000_0111
    return bytes(d)


def librustzcash_check_diversifier(diversifier: bytes) -> bool:
    return P.diversifier_g_d(diversifier) is not None


def librustzcash_ivk_to_pkd(ivk: bytes, diversifier: bytes) -> Optional[bytes]:
    s = _read_fs(ivk)
    if s is None:
        return None
    g_d = P.diversifier_g_d(diversifier)
    if g_d is None:
        return None
    return J.point_write(J.edwards_mul(g_d, s))


def librustzcash_sapling_generate_r() -> bytes:
    buf = os.urandom(64)
    return (int.from_bytes(buf, "little") % J.FS).to_bytes(32, "little")


def _priv_get_note(diversifier, pk_d_bytes, value, r_bytes):
    g_d = P.diversifier_g_d(diversifier)
    if g_d is None:
        return None
    pk_d = _read_point_prime_order(pk_d_bytes)
    if pk_d is None:
        return None
    r = _read_fs(r_bytes)
    if r is None:
        return None
    return P.Note(value=value, g_d=g_d, pk_d=pk_d, r=r)


def librustzcash_sapling_compute_nf(diversifier, pk_d, value, r, ak, nk,
                                    position) -> Optional[bytes]:
    note = _priv_get_note(diversifier, pk_d, value, r)
    if note is None:
        return None
    akp = _read_point_prime_order(ak)
    nkp = _read_point_prime_order(nk)
    if akp is None or nkp is None:
        return None
    vk = P.ViewingKey(akp, nkp)
    return note.nf(vk, position)


def librustzcash_sapling_compute_cm(diversifier, pk_d, value, r
                                    ) -> Optional[bytes]:
    note = _priv_get_note(diversifier, pk_d, value, r)
    if note is None:
        return None
    return _write_fr(note.cm())


def librustzcash_sapling_ka_agree(p: bytes, sk: bytes) -> Optional[bytes]:
    pt = J.point_read(p)
    if pt is None:
        return None
    s = _read_fs(sk)
    if s is None:
        return None
    shared = J.edwards_mul(J.edwards_mul(pt, 8), s)
    return J.point_write(shared)


def librustzcash_sapling_ka_derivepublic(diversifier: bytes, esk: bytes
                                         ) -> Optional[bytes]:
    g_d = P.diversifier_g_d(diversifier)
    if g_d is None:
        return None
    s = _read_fs(esk)
    if s is None:
        return None
    return J.point_write(J.edwards_mul(g_d, s))


def librustzcash_eh_isvalid(n, k, input_, nonce, soln) -> bool:
    return equihash.is_valid_solution(n, k, input_, nonce, soln)


# -- verification context (rustzcash.rs:651-943) -----------------------------


class SaplingVerificationContext:
    def __init__(self):
        self.bvk = J.ZERO


def librustzcash_sapling_verification_ctx_init():
    return SaplingVerificationContext()


def librustzcash_sapling_check_spend(ctx, cv, anchor, nullifier, rk, zkproof,
                                     spend_auth_sig, sighash_value) -> bool:
    from ..groth16 import BlsEngine

    cvp = J.point_read(cv)
    if cvp is None or _is_small_order(cvp):
        return False
    ctx.bvk = J.edwards_add(cvp, ctx.bvk)
    anchor_v = _read_fr(anchor)
    if anchor_v is None:
        return False
    data_to_be_signed = rk + sighash_value
    rkp = J.point_read(rk)
    if rkp is None or _is_small_order(rkp):
        return False
    if not RJ.PublicKey(rkp).verify(
        data_to_be_signed, spend_auth_sig, J.SPENDING_KEY_GENERATOR
    ):
        return False
    nf_packed = compute_multipacking(bytes_to_bits_le(nullifier))
    public_input = [rkp[0], rkp[1], cvp[0], cvp[1], anchor_v] + nf_packed
    try:
        proof = codecs.proof_from_bytes(zkproof)
    except codecs.CodecError:
        return False
    return verify_proof(BlsEngine(), _G.spend_vk, proof, public_input)


def librustzcash_sapling_check_output(ctx, cv, cm, epk, zkproof) -> bool:
    from ..groth16 import BlsEngine

    cvp = J.point_read(cv)
    if cvp is None or _is_small_order(cvp):
        return False
    ctx.bvk = J.edwards_add(J.edwards_neg(cvp), ctx.bvk)
    cm_v = _read_fr(cm)
    if cm_v is None:
        return False
    epkp = J.point_read(epk)
    if epkp is None or _is_small_order(epkp):
        return False
    public_input = [cvp[0], cvp[1], epkp[0], epkp[1], cm_v]
    try:
        proof = codecs.proof_from_bytes(zkproof)
    except codecs.CodecError:
        return False
    return verify_proof(BlsEngine(), _G.output_vk, proof, public_input)


def _compute_value_balance(value: int):
    if value == -(1 << 63):
        return None
    vb = J.edwards_mul(
        J.JubjubParams().generator(J.VALUE_COMMITMENT_VALUE), abs(value)
    )
    if value < 0:
        vb = J.edwards_neg(vb)
    return vb


def librustzcash_sapling_final_check(ctx, value_balance, binding_sig,
                                     sighash_value) -> bool:
    vb = _compute_value_balance(value_balance)
    if vb is None:
        return False
    bvk = J.edwards_add(ctx.bvk, J.edwards_neg(vb))
    data_to_be_signed = J.point_write(bvk) + sighash_value
    return RJ.PublicKey(bvk).verify(
        data_to_be_signed, binding_sig, J.VALUE_COMMITMENT_RANDOMNESS
    )


# -- proving context (rustzcash.rs:1147-1641) --------------------------------


class SaplingProvingContext:
    def __init__(self):
        self.bsk = 0
        self.bvk = J.ZERO


def librustzcash_sapling_proving_ctx_init():
    return SaplingProvingContext()


def librustzcash_sapling_spend_proof(ctx, ak, nsk, diversifier, rcm, ar,
                                     value, anchor, witness, rng=None):
    """Returns (cv, rk, zkproof) bytes or None (rustzcash.rs:1375-1627)."""
    import random as _random

    from ..circuits.sapling import Spend
    from ..groth16 import BlsEngine

    rng = rng or _random.SystemRandom()
    rcv = rng.randrange(J.FS)
    ctx.bsk = (ctx.bsk + rcv) % J.FS

    value_commitment = P.ValueCommitment(value, rcv)
    akp = _read_point_prime_order(ak)
    if akp is None:
        return None
    nsk_v = _read_fs(nsk)
    if nsk_v is None:
        return None
    pgk = P.ProofGenerationKey(akp, nsk_v)
    viewing_key = pgk.into_viewing_key()
    addr = viewing_key.into_payment_address(diversifier)
    if addr is None:
        return None
    rcm_v = _read_fs(rcm)
    ar_v = _read_fs(ar)
    if rcm_v is None or ar_v is None:
        return None
    rk = RJ.PublicKey(akp).randomize(ar_v, J.SPENDING_KEY_GENERATOR)
    anchor_v = _read_fr(anchor)
    if anchor_v is None:
        return None

    # Parse the incremental witness format (rustzcash.rs:1478-1535):
    # 1 byte depth, then depth * (1-byte len=32 || 32-byte sibling) in
    # reverse, then LE u64 position.
    assert witness[0] == SAPLING_TREE_DEPTH
    off = 1
    auth_path = [None] * SAPLING_TREE_DEPTH
    for i in range(SAPLING_TREE_DEPTH - 1, -1, -1):
        assert witness[off] == 32
        off += 1
        sibling = _read_fr(witness[off : off + 32])
        if sibling is None:
            return None
        off += 32
        auth_path[i] = (sibling, False)
    position = int.from_bytes(witness[off : off + 8], "little")
    assert off + 8 == len(witness)

    note = addr.create_note(value, rcm_v)
    nullifier = note.nf(viewing_key, position)
    pos = position
    for i in range(SAPLING_TREE_DEPTH):
        auth_path[i] = (auth_path[i][0], (pos & 1) == 1)
        pos >>= 1

    instance = Spend(
        value_commitment=value_commitment,
        proof_generation_key=pgk,
        payment_address=addr,
        commitment_randomness=rcm_v,
        ar=ar_v,
        auth_path=auth_path,
        anchor=anchor_v,
    )
    e = BlsEngine()
    proof = create_proof(
        e, instance, _G.spend_params,
        r=rng.randrange(FR_MOD), s=rng.randrange(FR_MOD),
    )

    # Self-check against the verifying key (rustzcash.rs:1560-1610).
    cv = value_commitment.cm()
    nf_packed = compute_multipacking(bytes_to_bits_le(nullifier))
    public_input = [rk.point[0], rk.point[1], cv[0], cv[1], anchor_v] + nf_packed
    if not verify_proof(e, _G.spend_vk, proof, public_input):
        return None
    ctx.bvk = J.edwards_add(cv, ctx.bvk)
    return (
        J.point_write(cv), J.point_write(rk.point),
        codecs.proof_to_bytes(proof),
    )


def librustzcash_sapling_output_proof(ctx, esk, diversifier, pk_d, rcm,
                                      value, rng=None):
    """Returns (cv, zkproof) bytes or None (rustzcash.rs:1147-1260)."""
    import random as _random

    from ..circuits.sapling import Output
    from ..groth16 import BlsEngine

    rng = rng or _random.SystemRandom()
    esk_v = _read_fs(esk)
    if esk_v is None:
        return None
    pk_d_p = _read_point_prime_order(pk_d)
    if pk_d_p is None:
        return None
    addr = P.PaymentAddress(pk_d=pk_d_p, diversifier=diversifier)
    rcm_v = _read_fs(rcm)
    if rcm_v is None:
        return None
    rcv = rng.randrange(J.FS)
    ctx.bsk = (ctx.bsk - rcv) % J.FS
    value_commitment = P.ValueCommitment(value, rcv)
    instance = Output(
        value_commitment=value_commitment,
        payment_address=addr,
        commitment_randomness=rcm_v,
        esk=esk_v,
    )
    proof = create_proof(
        BlsEngine(), instance, _G.output_params,
        r=rng.randrange(FR_MOD), s=rng.randrange(FR_MOD),
    )
    cv = value_commitment.cm()
    ctx.bvk = J.edwards_add(J.edwards_neg(cv), ctx.bvk)
    return (J.point_write(cv), codecs.proof_to_bytes(proof))


def librustzcash_sapling_spend_sig(ask, ar, sighash, rng=None
                                   ) -> Optional[bytes]:
    ar_v = _read_fs(ar)
    ask_v = _read_fs(ask)
    if ar_v is None or ask_v is None:
        return None
    rsk = RJ.PrivateKey(ask_v).randomize(ar_v)
    rk = RJ.PublicKey.from_private(rsk, J.SPENDING_KEY_GENERATOR)
    data_to_be_signed = rk.write() + sighash
    t = None if rng is None else bytes(
        rng.randrange(256) for _ in range(80)
    )
    return rsk.sign(data_to_be_signed, J.SPENDING_KEY_GENERATOR, t=t)


def librustzcash_sapling_binding_sig(ctx, value_balance, sighash, rng=None
                                     ) -> Optional[bytes]:
    bsk = RJ.PrivateKey(ctx.bsk)
    bvk = RJ.PublicKey.from_private(bsk, J.VALUE_COMMITMENT_RANDOMNESS)
    vb = _compute_value_balance(value_balance)
    if vb is None:
        return None
    if bvk.point != J.edwards_add(ctx.bvk, J.edwards_neg(vb)):
        return None
    data_to_be_signed = bvk.write() + sighash
    t = None if rng is None else bytes(
        rng.randrange(256) for _ in range(80)
    )
    return bsk.sign(data_to_be_signed, J.VALUE_COMMITMENT_RANDOMNESS, t=t)


# -- ZIP 32 (rustzcash.rs:1644-1720) -----------------------------------------


def librustzcash_zip32_xsk_master(seed: bytes) -> bytes:
    from ..protocol import zip32 as Z

    return Z.ExtendedSpendingKey.master(seed).to_bytes()


def librustzcash_zip32_xsk_derive(xsk_parent: bytes, i: int) -> bytes:
    from ..protocol import zip32 as Z

    xsk = Z.ExtendedSpendingKey.from_bytes(xsk_parent)
    return xsk.derive_child(i).to_bytes()


def _xfvk_from_bytes(b: bytes):
    """169-byte layout: depth(1) || tag(4) || i(4) || chain(32) || ak(32)
    || nk(32) || ovk(32) || dk(32)."""
    from ..protocol import zip32 as Z

    assert len(b) == 169
    ak = J.point_read(b[41:73])
    nk = J.point_read(b[73:105])
    if ak is None or nk is None:
        return None
    return Z.ExtendedFullViewingKey(
        depth=b[0], parent_fvk_tag=b[1:5],
        child_index=int.from_bytes(b[5:9], "little"),
        chain_code=b[9:41],
        fvk=Z.FullViewingKey(ak, nk, b[105:137]),
        dk=Z.DiversifierKey(b[137:169]),
    )


def librustzcash_zip32_xfvk_derive(xfvk_parent: bytes, i: int
                                   ) -> Optional[bytes]:
    xfvk = _xfvk_from_bytes(xfvk_parent)
    if xfvk is None:
        return None
    child = xfvk.derive_child(i)
    return None if child is None else child.to_bytes()


def librustzcash_zip32_xfvk_address(xfvk: bytes, j: bytes):
    """Returns (j_ret, addr_bytes(43)) or None (rustzcash.rs:1695-1720)."""
    x = _xfvk_from_bytes(xfvk)
    if x is None:
        return None
    res = x.address(int.from_bytes(j, "little"))
    if res is None:
        return None
    j_ret, addr = res
    return (
        j_ret.to_bytes(11, "little"),
        addr.diversifier + J.point_write(addr.pk_d),
    )


# -- Sprout (rustzcash.rs:945-1145) ------------------------------------------

SPROUT_TREE_DEPTH = 29


def _parse_sprout_witness(auth: bytes):
    """1-byte depth || 29 x (1-byte len=32 || sibling bytes) in reverse ||
    LE u64 position -> auth_path [(sibling_bytes, is_right)]."""
    assert auth[0] == SPROUT_TREE_DEPTH
    off = 1
    path = [None] * SPROUT_TREE_DEPTH
    for i in range(SPROUT_TREE_DEPTH - 1, -1, -1):
        assert auth[off] == 32
        off += 1
        path[i] = [auth[off : off + 32], False]
        off += 32
    position = int.from_bytes(auth[off : off + 8], "little")
    for i in range(SPROUT_TREE_DEPTH):
        path[i][1] = bool((position >> i) & 1)
    return [tuple(p) for p in path]


def librustzcash_sprout_prove(
    sprout_params, phi, rt, h_sig,
    in_sk1, in_value1, in_rho1, in_r1, in_auth1,
    in_sk2, in_value2, in_rho2, in_r2, in_auth2,
    out_pk1, out_value1, out_r1,
    out_pk2, out_value2, out_r2,
    vpub_old, vpub_new, rng=None,
) -> bytes:
    """Create a Groth16 JoinSplit proof (192 bytes).  `sprout_params` is
    a groth16.Parameters for the Sprout circuit (the reference streams the
    giant params file per call, rustzcash.rs:1062-1090)."""
    import random as _random

    from ..circuits.sprout import JoinSplit, JSInput, JSOutput
    from ..groth16 import BlsEngine

    rng = rng or _random.SystemRandom()
    inputs = [
        JSInput(value=in_value1, a_sk=in_sk1, rho=in_rho1, r=in_r1,
                auth_path=_parse_sprout_witness(in_auth1)),
        JSInput(value=in_value2, a_sk=in_sk2, rho=in_rho2, r=in_r2,
                auth_path=_parse_sprout_witness(in_auth2)),
    ]
    outputs = [
        JSOutput(value=out_value1, a_pk=out_pk1, r=out_r1),
        JSOutput(value=out_value2, a_pk=out_pk2, r=out_r2),
    ]
    js = JoinSplit(vpub_old=vpub_old, vpub_new=vpub_new, h_sig=h_sig,
                   phi=phi, inputs=inputs, outputs=outputs, rt=rt)
    e = BlsEngine()
    proof = create_proof(
        e, js, sprout_params,
        r=rng.randrange(FR_MOD), s=rng.randrange(FR_MOD),
    )
    return codecs.proof_to_bytes(proof)


def librustzcash_sprout_verify(sprout_pvk, proof, rt, h_sig, mac1, mac2,
                               nf1, nf2, cm1, cm2, vpub_old, vpub_new
                               ) -> bool:
    """Verify a JoinSplit proof against the packed public inputs
    (rustzcash.rs:1093-1139)."""
    from ..circuits.multipack import bytes_to_bits
    from ..groth16 import BlsEngine

    data = (rt + h_sig + nf1 + mac1 + nf2 + mac2 + cm1 + cm2
            + int(vpub_old).to_bytes(8, "little")
            + int(vpub_new).to_bytes(8, "little"))
    public_input = compute_multipacking(bytes_to_bits(data))
    try:
        p = codecs.proof_from_bytes(proof)
    except codecs.CodecError:
        return False
    return verify_proof(BlsEngine(), sprout_pvk, p, public_input)


# -- benchmark / self-test entry (rustzcash.rs:1370) --------------------------


def librustzcash_run_tests(n: int = 4096) -> bool:
    """MSM self-test + timing, the role of ``librustzcash_run_tests``
    (rustzcash.rs:1370 -> bellman::multiexp::run_tests, multiexp.rs:538-593).

    The reference's version loads the 10M-pair fixture and races every GPU
    MSM variant against the CPU Pippenger; here we generate ``n`` pairs with
    the same XorShift stream (utils.fixtures), run the device MSM, and check
    it bit-exactly against the python-int oracle.  Returns True on match
    and prints one timing line per phase, mirroring the reference's output
    style.
    """
    import tempfile
    import time

    from ..groth16 import BlsEngine
    from ..oracle import curve as O
    from ..utils import fixtures
    from ..utils.limbs import limbs_to_int

    with tempfile.NamedTemporaryFile(suffix=".zkfx") as f:
        fixtures.generate(f.name, n)
        x_l, y_l, s_l = fixtures.load(f.name)
    points = [(limbs_to_int(x), limbs_to_int(y)) for x, y in zip(x_l, y_l)]
    scalars = [limbs_to_int(s) for s in s_l]
    e = BlsEngine()
    t0 = time.time()
    got = e.msm_g1(points, scalars)
    t1 = time.time()
    want = O.g1_msm(points, scalars)
    t2 = time.time()
    print(f"run_tests: n={n} device_msm={t1-t0:.3f}s host_oracle={t2-t1:.3f}s "
          f"match={got == want}")
    return got == want


def librustzcash_sapling_proving_ctx_free(ctx) -> None:
    """Drop a proving context (rustzcash.rs ctx_free).  Python GC owns the
    object; this clears the accumulated bsk/bvk state so reuse after free
    fails loudly."""
    ctx.bsk = None
    ctx.bvk = None


def librustzcash_sapling_verification_ctx_free(ctx) -> None:
    """Drop a verification context (rustzcash.rs ctx_free)."""
    ctx.bvk = None
