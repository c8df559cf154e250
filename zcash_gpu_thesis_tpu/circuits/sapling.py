"""Sapling Spend and Output circuits
(re-design of ``circuit/sapling/mod.rs``).

Pinned parity goldens (mod.rs:715,720,792,806): Spend = 98,777 constraints
and 8 public inputs; Output = 7,827 constraints and 6 public inputs.

Witness structures come from ``protocol.primitives`` (python-int host
crypto); all fields are optional (None for CRS generation).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from .. import wv
from ..groth16.r1cs import Circuit, LinearCombination
from ..protocol import jubjub as J
from . import blake2s as gblake
from . import ecc as gecc
from . import pedersen_hash as gped
from .boolean import AllocatedBit, Boolean, field_into_boolean_vec_le, \
    u64_into_boolean_vec_le
from .multipack import pack_into_inputs
from .num import AllocatedNum, Num

FS_NUM_BITS = 252    # Fs::NUM_BITS (fs.rs:12)
FS_CAPACITY = 251    # Fs::CAPACITY (fs.rs:290)
TREE_DEPTH = 32      # Sapling commitment tree depth


def expose_value_commitment(cs, name: str, value_commitment):
    """Expose cv = [value] V + [rcv] R as inputs; returns the value bits
    (sapling/mod.rs:81-130)."""
    value = None if value_commitment is None else value_commitment.value
    value_bits = u64_into_boolean_vec_le(cs, f"{name}/value", value)
    value_pt = gecc.fixed_base_multiplication(
        cs, f"{name}/compute the value in the exponent",
        J.VALUE_COMMITMENT_VALUE, value_bits,
    )
    rcv_val = None if value_commitment is None else value_commitment.randomness
    rcv_bits = field_into_boolean_vec_le(
        cs, f"{name}/rcv", rcv_val, FS_NUM_BITS
    )
    rcv_pt = gecc.fixed_base_multiplication(
        cs, f"{name}/computation of rcv",
        J.VALUE_COMMITMENT_RANDOMNESS, rcv_bits,
    )
    cv = value_pt.add(cs, f"{name}/computation of cv", rcv_pt)
    cv.inputize(cs, f"{name}/commitment point")
    return value_bits


class _TracedPaymentAddress:
    """Leaf shim: a payment address whose g_d / pk_d are prederived
    values (trace nodes) instead of protocol objects."""

    def __init__(self, g_d=None, pk_d=None):
        self._g_d = g_d
        self.pk_d = pk_d

    def g_d(self):
        return self._g_d


class _Bag:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class Spend(Circuit):
    """The Sapling Spend statement (sapling/mod.rs:35-463)."""

    @staticmethod
    def structure_key():
        # Constraint structure is witness-independent (the reference pins
        # it: 98,777 constraints, sapling/mod.rs:715) — cacheable for the
        # compiled-R1CS prover path.
        return "sapling-spend"

    def __init__(self, value_commitment=None, proof_generation_key=None,
                 payment_address=None, commitment_randomness: Optional[int] = None,
                 ar: Optional[int] = None,
                 auth_path: Optional[List[Optional[Tuple[int, bool]]]] = None,
                 anchor: Optional[int] = None):
        self.value_commitment = value_commitment
        self.proof_generation_key = proof_generation_key
        self.payment_address = payment_address
        self.commitment_randomness = commitment_randomness
        self.ar = ar
        self.auth_path = auth_path if auth_path is not None else [None] * TREE_DEPTH
        self.anchor = anchor

    def witness_leaves(self):
        """Flat per-proof witness values for the tape replay (wv): the
        compiled-speed analog of the reference's witness struct fields
        (prover.rs:84-190 consumes them through circuit.synthesize)."""
        vc, pgk = self.value_commitment, self.proof_generation_key
        g_d = self.payment_address.g_d()
        out = [vc.value, vc.randomness, pgk.ak[0], pgk.ak[1], pgk.nsk,
               g_d[0], g_d[1], self.commitment_randomness, self.ar]
        for e in self.auth_path:
            out.extend((e[0], int(bool(e[1]))))
        out.append(self.anchor)
        return out

    def with_leaves(self, ls):
        """Rebuild the circuit instance over trace-node leaves in
        ``witness_leaves`` order (same shape, same synthesize walk)."""
        it = iter(ls)
        vc = _Bag(value=next(it), randomness=next(it))
        pgk = _Bag(ak=(next(it), next(it)), nsk=next(it))
        pa = _TracedPaymentAddress(g_d=(next(it), next(it)))
        rcm, ar = next(it), next(it)
        path = [(next(it), next(it)) for _ in self.auth_path]
        anchor = next(it)
        return Spend(value_commitment=vc, proof_generation_key=pgk,
                     payment_address=pa, commitment_randomness=rcm, ar=ar,
                     auth_path=path, anchor=anchor)

    def synthesize(self, cs):
        pgk = self.proof_generation_key
        ak = gecc.EdwardsPoint.witness(
            cs, "ak", None if pgk is None else pgk.ak
        )
        ak.assert_not_small_order(cs, "ak not small order")

        # Rerandomize ak -> rk, expose as input
        ar_bits = field_into_boolean_vec_le(cs, "ar", self.ar, FS_NUM_BITS)
        ar_pt = gecc.fixed_base_multiplication(
            cs, "computation of randomization for the signing key",
            J.SPENDING_KEY_GENERATOR, ar_bits,
        )
        rk = ak.add(cs, "computation of rk", ar_pt)
        rk.inputize(cs, "rk")

        # nk = [nsk] ProofGenerationKey
        nsk_bits = field_into_boolean_vec_le(
            cs, "nsk", None if pgk is None else pgk.nsk, FS_NUM_BITS
        )
        nk = gecc.fixed_base_multiplication(
            cs, "computation of nk", J.PROOF_GENERATION_KEY, nsk_bits
        )

        ivk_preimage = []
        ivk_preimage.extend(ak.repr_(cs, "representation of ak"))
        nf_preimage = []
        repr_nk = nk.repr_(cs, "representation of nk")
        ivk_preimage.extend(repr_nk)
        nf_preimage.extend(repr_nk)
        assert len(ivk_preimage) == 512
        assert len(nf_preimage) == 256

        ivk = gblake.blake2s(
            cs, "computation of ivk", ivk_preimage, J.CRH_IVK_PERSONALIZATION
        )
        ivk = ivk[:FS_CAPACITY]  # drop_5

        g_d_val = (
            None if self.payment_address is None else self.payment_address.g_d()
        )
        g_d = gecc.EdwardsPoint.witness(cs, "witness g_d", g_d_val)
        g_d.assert_not_small_order(cs, "g_d not small order")

        pk_d = g_d.mul(cs, "compute pk_d", ivk)

        note_contents = []
        value_num = Num.zero()
        value_bits = expose_value_commitment(
            cs, "value commitment", self.value_commitment
        )
        coeff = 1
        from ..groth16.r1cs import ONE

        for bit in value_bits:
            value_num = value_num.add_bool_with_coeff(ONE, bit, coeff)
            coeff <<= 1
        note_contents.extend(value_bits)
        note_contents.extend(g_d.repr_(cs, "representation of g_d"))
        note_contents.extend(pk_d.repr_(cs, "representation of pk_d"))
        assert len(note_contents) == 64 + 256 + 256

        cm = gped.pedersen_hash(
            cs, "note content hash",
            J.note_commitment_personalization(), note_contents,
        )
        rcm_bits = field_into_boolean_vec_le(
            cs, "rcm", self.commitment_randomness, FS_NUM_BITS
        )
        rcm_pt = gecc.fixed_base_multiplication(
            cs, "computation of commitment randomness",
            J.NOTE_COMMITMENT_RANDOMNESS, rcm_bits,
        )
        cm = cm.add(cs, "randomization of note commitment", rcm_pt)

        # Merkle path ascent
        position_bits = []
        cur = cm.x
        for i, e in enumerate(self.auth_path):
            ns = f"merkle tree hash {i}"
            cur_is_right = Boolean.from_bit(
                AllocatedBit.alloc(
                    cs, f"{ns}/position bit",
                    None if e is None else e[1],
                )
            )
            position_bits.append(cur_is_right)
            path_element = AllocatedNum.alloc(
                cs, f"{ns}/path element",
                lambda e=e: None if e is None else e[0],
            )
            xl, xr = AllocatedNum.conditionally_reverse(
                cs, f"{ns}/conditional reversal of preimage",
                cur, path_element, cur_is_right,
            )
            preimage = []
            preimage.extend(xl.into_bits_le(cs, f"{ns}/xl into bits"))
            preimage.extend(xr.into_bits_le(cs, f"{ns}/xr into bits"))
            cur = gped.pedersen_hash(
                cs, f"{ns}/computation of pedersen hash",
                J.merkle_tree_personalization(i), preimage,
            ).x

        # Conditionally enforce the anchor
        rt = AllocatedNum.alloc(cs, "conditional anchor", lambda: self.anchor)
        cs.enforce(
            "conditionally enforce correct root",
            LinearCombination([(cur.variable, 1), (rt.variable, -1)]),
            value_num.lc(1),
            LinearCombination(),
        )
        rt.inputize(cs, "anchor")

        # rho = cm + [position] J; nf = BLAKE2s(nk || rho)
        position = gecc.fixed_base_multiplication(
            cs, "g^position", J.NULLIFIER_POSITION, position_bits
        )
        rho = cm.add(cs, "faerie gold prevention", position)
        nf_preimage.extend(rho.repr_(cs, "representation of rho"))
        assert len(nf_preimage) == 512
        nf = gblake.blake2s(
            cs, "nf computation", nf_preimage, J.PRF_NF_PERSONALIZATION
        )
        pack_into_inputs(cs, "pack nullifier", nf)


class Output(Circuit):
    """The Sapling Output statement (sapling/mod.rs:464-600)."""

    @staticmethod
    def structure_key():
        return "sapling-output"  # 7,827 constraints (mod.rs:792), fixed

    def __init__(self, value_commitment=None, payment_address=None,
                 commitment_randomness: Optional[int] = None,
                 esk: Optional[int] = None):
        self.value_commitment = value_commitment
        self.payment_address = payment_address
        self.commitment_randomness = commitment_randomness
        self.esk = esk

    def witness_leaves(self):
        vc = self.value_commitment
        g_d = self.payment_address.g_d()
        pk_d = self.payment_address.pk_d
        return [vc.value, vc.randomness, g_d[0], g_d[1], pk_d[0], pk_d[1],
                self.commitment_randomness, self.esk]

    def with_leaves(self, ls):
        it = iter(ls)
        vc = _Bag(value=next(it), randomness=next(it))
        pa = _TracedPaymentAddress(g_d=(next(it), next(it)),
                                   pk_d=(next(it), next(it)))
        return Output(value_commitment=vc, payment_address=pa,
                      commitment_randomness=next(it), esk=next(it))

    def synthesize(self, cs):
        note_contents = []
        note_contents.extend(
            expose_value_commitment(
                cs, "value commitment", self.value_commitment
            )
        )

        g_d_val = (
            None if self.payment_address is None else self.payment_address.g_d()
        )
        g_d = gecc.EdwardsPoint.witness(cs, "witness g_d", g_d_val)
        g_d.assert_not_small_order(cs, "g_d not small order")
        note_contents.extend(g_d.repr_(cs, "representation of g_d"))

        esk_bits = field_into_boolean_vec_le(cs, "esk", self.esk, FS_NUM_BITS)
        epk = g_d.mul(cs, "epk computation", esk_bits)
        epk.inputize(cs, "epk")

        # pk_d: witness y bits + sign bit, no checks
        pk_d = (
            None if self.payment_address is None else self.payment_address.pk_d
        )
        y_contents = field_into_boolean_vec_le(
            cs, "pk_d bits of y", None if pk_d is None else pk_d[1], 255
        )
        sign_bit = Boolean.from_bit(
            AllocatedBit.alloc(
                cs, "pk_d bit of x",
                None if pk_d is None else wv.bit(pk_d[0], 0),
            )
        )
        note_contents.extend(y_contents)
        note_contents.append(sign_bit)
        assert len(note_contents) == 64 + 256 + 256

        cm = gped.pedersen_hash(
            cs, "note content hash",
            J.note_commitment_personalization(), note_contents,
        )
        rcm_bits = field_into_boolean_vec_le(
            cs, "rcm", self.commitment_randomness, FS_NUM_BITS
        )
        rcm_pt = gecc.fixed_base_multiplication(
            cs, "computation of commitment randomness",
            J.NOTE_COMMITMENT_RANDOMNESS, rcm_bits,
        )
        cm = cm.add(cs, "randomization of note commitment", rcm_pt)
        cm.x.inputize(cs, "commitment")
