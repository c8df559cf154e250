"""Sprout JoinSplit circuit (re-design of ``circuit/sprout/``).

SHA256-compression-based notes: PRFs (prfs.rs), note commitments
(commitment.rs), input notes with 29-deep Merkle membership (input.rs),
output notes (output.rs) and the JoinSplit statement (mod.rs).  Pinned
parity golden: 1,989,085 constraints and 10 packed public inputs
(circuit/sprout/mod.rs:465-467) plus the constraint-system shape hash.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from .. import wv
from ..groth16.r1cs import Circuit, LinearCombination, ONE
from .boolean import AllocatedBit, Boolean
from .multipack import pack_into_inputs
from .sha256 import sha256, sha256_block_no_padding

TREE_DEPTH = 29


class NoteValue:
    """64 allocated LE bits of a note value (mod.rs:228-298)."""

    def __init__(self, cs, name: str, value: Optional[int]):
        self.value = value
        self.bits = [
            AllocatedBit.alloc(
                cs, f"{name}/bit {i}",
                None if value is None else wv.bit(value, i),
            )
            for i in range(64)
        ]

    def bits_le(self):
        """LE byte order: within each byte, bits MSB-first (mod.rs:272)."""
        out = []
        for i in range(0, 64, 8):
            chunk = self.bits[i : i + 8]
            out.extend(Boolean.from_bit(b) for b in reversed(chunk))
        return out

    def lc(self) -> LinearCombination:
        return LinearCombination(
            [(b.variable, 1 << i) for i, b in enumerate(self.bits)]
        )

    def get_value(self):
        return self.value


def witness_bits(cs, name: str, value: Optional[bytes], num_bits: int,
                 skip_bits: int):
    """Allocate bits of a byte string, MSB-first per byte, skipping the
    first skip_bits (mod.rs:301-334)."""
    if value is None:
        flat = [None] * num_bits
    else:
        # bytes, or a big-endian integer / trace node of the string
        flat = wv.byte_bits_msb(value, num_bits, skip_bits)
        assert len(flat) == num_bits
    return [
        Boolean.from_bit(AllocatedBit.alloc(cs, f"{name}/bit {i}", v))
        for i, v in enumerate(flat)
    ]


def witness_u256(cs, name, value):
    return witness_bits(cs, name, value, 256, 0)


def witness_u252(cs, name, value):
    return witness_bits(cs, name, value, 252, 4)


# -- PRFs (prfs.rs) ---------------------------------------------------------


def _prf(cs, name, a, b, c, d, x, y):
    assert len(x) == 252 and len(y) == 256
    image = [Boolean.constant(a), Boolean.constant(b),
             Boolean.constant(c), Boolean.constant(d)]
    image.extend(x)
    image.extend(y)
    assert len(image) == 512
    return sha256_block_no_padding(cs, name, image)


def prf_a_pk(cs, name, a_sk):
    zeros = [Boolean.constant(False)] * 256
    return _prf(cs, name, True, True, False, False, a_sk, zeros)


def prf_nf(cs, name, a_sk, rho):
    return _prf(cs, name, True, True, True, False, a_sk, rho)


def prf_pk(cs, name, a_sk, h_sig, nonce):
    return _prf(cs, name, False, nonce, False, False, a_sk, h_sig)


def prf_rho(cs, name, phi, h_sig, nonce):
    return _prf(cs, name, False, nonce, True, False, phi, h_sig)


# -- note commitment (commitment.rs) ----------------------------------------


def note_comm(cs, name, a_pk, value, rho, r):
    assert len(a_pk) == 256 and len(value) == 64
    assert len(rho) == 256 and len(r) == 256
    lead = [True, False, True, True, False, False, False, False]
    image = [Boolean.constant(b) for b in lead]
    image.extend(a_pk)
    image.extend(value)
    image.extend(rho)
    image.extend(r)
    return sha256(cs, name, image)


# -- conditional swap (input.rs:149-226) -------------------------------------


def conditionally_swap_u256(cs, name, lhs, rhs, condition: AllocatedBit):
    assert len(lhs) == 256 and len(rhs) == 256
    new_lhs, new_rhs = [], []
    cond_val = condition.value
    for i, (l, r) in enumerate(zip(lhs, rhs)):
        ns = f"{name}/bit {i}"
        lv, rv = l.get_value(), r.get_value()
        xv = None if cond_val is None else wv.select(cond_val, rv, lv)
        x = Boolean.from_bit(AllocatedBit.alloc(cs, f"{ns}/x", xv))
        cs.enforce(
            f"{ns}/conditional swap for x",
            r.lc() - l.lc(),
            LinearCombination([(condition.variable, 1)]),
            x.lc() - l.lc(),
        )
        yv = None if cond_val is None else wv.select(cond_val, lv, rv)
        y = Boolean.from_bit(AllocatedBit.alloc(cs, f"{ns}/y", yv))
        cs.enforce(
            f"{ns}/conditional swap for y",
            l.lc() - r.lc(),
            LinearCombination([(condition.variable, 1)]),
            y.lc() - r.lc(),
        )
        new_lhs.append(x)
        new_rhs.append(y)
    return new_lhs + new_rhs


# -- notes (input.rs / output.rs) --------------------------------------------


class InputNote:
    def __init__(self, nf, mac):
        self.nf = nf
        self.mac = mac

    @staticmethod
    def compute(cs, name, a_sk_bytes, rho_bytes, r_bytes, value: NoteValue,
                h_sig, nonce: bool, auth_path, rt):
        a_sk = witness_u252(cs, f"{name}/a_sk", a_sk_bytes)
        rho = witness_u256(cs, f"{name}/rho", rho_bytes)
        r = witness_u256(cs, f"{name}/r", r_bytes)
        a_pk = prf_a_pk(cs, f"{name}/a_pk computation", a_sk)
        nf = prf_nf(cs, f"{name}/nf computation", a_sk, rho)
        mac = prf_pk(cs, f"{name}/mac computation", a_sk, h_sig, nonce)
        cm = note_comm(
            cs, f"{name}/cm computation", a_pk, value.bits_le(), rho, r
        )

        cur = cm
        for i, layer in enumerate(auth_path):
            ns = f"{name}/layer {i}"
            cur_is_right = AllocatedBit.alloc(
                cs, f"{ns}/cur is right",
                None if layer is None else layer[1],
            )
            rhs = witness_u256(
                cs, f"{ns}/sibling",
                None if layer is None else layer[0],
            )
            preimage = conditionally_swap_u256(
                cs, f"{ns}/conditional swap", cur, rhs, cur_is_right
            )
            cur = sha256_block_no_padding(
                cs, f"{ns}/hash of this layer", preimage
            )

        enforce = AllocatedBit.alloc(
            cs, f"{name}/enforce",
            None if value.get_value() is None
            else wv.isnz(value.get_value()),
        )
        cs.enforce(
            f"{name}/enforce validity",
            value.lc(),
            LinearCombination([(ONE, 1), (enforce.variable, -1)]),
            LinearCombination(),
        )
        assert len(cur) == len(rt)
        for i, (c, rt_bit) in enumerate(zip(cur, rt)):
            cs.enforce(
                f"{name}/conditionally enforce correct root for bit {i}",
                c.lc() - rt_bit.lc(),
                LinearCombination([(enforce.variable, 1)]),
                LinearCombination(),
            )
        return InputNote(nf=nf, mac=mac)


class OutputNote:
    def __init__(self, cm):
        self.cm = cm

    @staticmethod
    def compute(cs, name, a_pk_bytes, value: NoteValue, r_bytes, phi, h_sig,
                nonce: bool):
        rho = prf_rho(cs, f"{name}/rho", phi, h_sig, nonce)
        a_pk = witness_u256(cs, f"{name}/a_pk", a_pk_bytes)
        r = witness_u256(cs, f"{name}/r", r_bytes)
        cm = note_comm(
            cs, f"{name}/cm computation", a_pk, value.bits_le(), rho, r
        )
        return OutputNote(cm)


# -- the JoinSplit statement (mod.rs:47-226) ---------------------------------


class JSInput:
    def __init__(self, value=None, a_sk=None, rho=None, r=None,
                 auth_path: Optional[List[Optional[Tuple[bytes, bool]]]] = None):
        self.value = value
        self.a_sk = a_sk
        self.rho = rho
        self.r = r
        self.auth_path = (
            auth_path if auth_path is not None else [None] * TREE_DEPTH
        )


class JSOutput:
    def __init__(self, value=None, a_pk=None, r=None):
        self.value = value
        self.a_pk = a_pk
        self.r = r


class JoinSplit(Circuit):
    def __init__(self, vpub_old=None, vpub_new=None, h_sig=None, phi=None,
                 inputs=None, outputs=None, rt=None):
        self.vpub_old = vpub_old
        self.vpub_new = vpub_new
        self.h_sig = h_sig
        self.phi = phi
        self.inputs = inputs if inputs is not None else [JSInput(), JSInput()]
        self.outputs = (
            outputs if outputs is not None else [JSOutput(), JSOutput()]
        )
        self.rt = rt

    @staticmethod
    def structure_key():
        # 1,989,085 constraints, witness-independent (sprout/mod.rs:465)
        return "sprout-joinsplit"

    def witness_leaves(self):
        """Flat per-proof witness values for the tape replay; byte
        strings travel as big-endian integers (wv.byte_bits_msb)."""
        def b2i(x):
            return int.from_bytes(x, "big")

        out = [self.vpub_old, self.vpub_new, b2i(self.h_sig),
               b2i(self.phi), b2i(self.rt)]
        for inp in self.inputs:
            out.extend([inp.value, b2i(inp.a_sk), b2i(inp.rho),
                        b2i(inp.r)])
            for sib, right in inp.auth_path:
                out.extend((b2i(sib), int(bool(right))))
        for o in self.outputs:
            out.extend([o.value, b2i(o.a_pk), b2i(o.r)])
        return out

    def with_leaves(self, ls):
        it = iter(ls)
        vpub_old, vpub_new, h_sig, phi, rt = (next(it) for _ in range(5))
        inputs = []
        for inp in self.inputs:
            value, a_sk, rho, r = (next(it) for _ in range(4))
            path = [(next(it), next(it)) for _ in inp.auth_path]
            inputs.append(JSInput(value=value, a_sk=a_sk, rho=rho, r=r,
                                  auth_path=path))
        outputs = [JSOutput(value=next(it), a_pk=next(it), r=next(it))
                   for _ in self.outputs]
        return JoinSplit(vpub_old=vpub_old, vpub_new=vpub_new,
                         h_sig=h_sig, phi=phi, inputs=inputs,
                         outputs=outputs, rt=rt)

    def synthesize(self, cs):
        assert len(self.inputs) == 2 and len(self.outputs) == 2
        vpub_old = NoteValue(cs, "vpub_old", self.vpub_old)
        vpub_new = NoteValue(cs, "vpub_new", self.vpub_new)
        lhs = vpub_old.lc()
        rhs = vpub_new.lc()

        rt = witness_u256(cs, "rt", self.rt)
        h_sig = witness_u256(cs, "h_sig", self.h_sig)
        phi = witness_u252(cs, "phi", self.phi)

        input_notes = []
        lhs_total = self.vpub_old
        for i, inp in enumerate(self.inputs):
            ns = f"input {i}"
            if inp.value is not None and lhs_total is not None:
                lhs_total = wv.mask64(lhs_total + inp.value)
            value = NoteValue(cs, f"{ns}/value", inp.value)
            nonce = i == 1
            input_notes.append(
                InputNote.compute(
                    cs, f"{ns}/note", inp.a_sk, inp.rho, inp.r, value,
                    h_sig, nonce, inp.auth_path, rt,
                )
            )
            lhs = lhs + value.lc()

        # zcash/zcash#854: lhs must fit in 64 bits
        lhs_total_nv = NoteValue(
            cs, "total value of left hand side", lhs_total
        )
        cs.enforce(
            "left hand side can be expressed as a 64-bit unsigned integer",
            lhs,
            LinearCombination([(ONE, 1)]),
            lhs_total_nv.lc(),
        )

        output_notes = []
        for i, outp in enumerate(self.outputs):
            ns = f"output {i}"
            value = NoteValue(cs, f"{ns}/value", outp.value)
            nonce = i == 1
            output_notes.append(
                OutputNote.compute(
                    cs, f"{ns}/note", outp.a_pk, value, outp.r, phi,
                    h_sig, nonce,
                )
            )
            rhs = rhs + value.lc()

        cs.enforce(
            "balance equation", lhs, LinearCombination([(ONE, 1)]), rhs
        )

        public_inputs = []
        public_inputs.extend(rt)
        public_inputs.extend(h_sig)
        for note in input_notes:
            public_inputs.extend(note.nf)
            public_inputs.extend(note.mac)
        for note in output_notes:
            public_inputs.extend(note.cm)
        public_inputs.extend(vpub_old.bits_le())
        public_inputs.extend(vpub_new.bits_le())
        pack_into_inputs(cs, "input packing", public_inputs)
