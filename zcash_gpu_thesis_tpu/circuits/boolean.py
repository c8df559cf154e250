"""Boolean gadgets (re-design of ``circuit/boolean.rs``).

``AllocatedBit`` is a variable constrained to {0, 1}; ``Boolean`` is a
tri-state view (Is / Not / Constant) whose negation is free.  All
constraint shapes match the reference exactly (the pinned Sapling
constraint counts depend on it).

Values are python bools or None (absent witness, e.g. during CRS
generation where value closures are never invoked).
"""

from __future__ import annotations

from typing import Optional

from .. import wv
from ..groth16.r1cs import ONE, LinearCombination, Variable


def _b2i(v):
    """Bit value -> allocation value: bool/int 0/1, or a wv.TV trace
    node passed through untouched (the tape records bit values as 0/1
    field elements)."""
    if v is None:
        return None
    return v if wv.is_tv(v) else int(bool(v))


class AllocatedBit:
    def __init__(self, variable: Variable, value: Optional[bool]):
        self.variable = variable
        self.value = value

    @staticmethod
    def alloc(cs, name: str, value: Optional[bool]) -> "AllocatedBit":
        var = cs.alloc(f"{name}/boolean", lambda: _b2i(value))
        # (1 - a) * a = 0  (boolean.rs:93)
        cs.enforce(
            f"{name}/boolean constraint",
            LinearCombination([(ONE, 1), (var, -1)]),
            LinearCombination([(var, 1)]),
            LinearCombination(),
        )
        return AllocatedBit(var, value)

    @staticmethod
    def alloc_conditionally(cs, name: str, value: Optional[bool],
                            must_be_false: "AllocatedBit") -> "AllocatedBit":
        var = cs.alloc(f"{name}/boolean", lambda: _b2i(value))
        # (1 - must_be_false - a) * a = 0  (boolean.rs:61)
        cs.enforce(
            f"{name}/boolean constraint",
            LinearCombination([(ONE, 1), (must_be_false.variable, -1), (var, -1)]),
            LinearCombination([(var, 1)]),
            LinearCombination(),
        )
        return AllocatedBit(var, value)

    @staticmethod
    def xor(cs, name: str, a: "AllocatedBit", b: "AllocatedBit"):
        value = None if a.value is None or b.value is None else a.value ^ b.value
        var = cs.alloc(f"{name}/xor result", lambda: _b2i(value))
        # (a + a) * b = a + b - c  (boolean.rs:145)
        cs.enforce(
            f"{name}/xor constraint",
            LinearCombination([(a.variable, 2)]),
            LinearCombination([(b.variable, 1)]),
            LinearCombination([(a.variable, 1), (b.variable, 1), (var, -1)]),
        )
        return AllocatedBit(var, value)

    @staticmethod
    def and_(cs, name: str, a: "AllocatedBit", b: "AllocatedBit"):
        value = None if a.value is None or b.value is None else a.value & b.value
        var = cs.alloc(f"{name}/and result", lambda: _b2i(value))
        # a * b = c  (boolean.rs:184)
        cs.enforce(
            f"{name}/and constraint",
            LinearCombination([(a.variable, 1)]),
            LinearCombination([(b.variable, 1)]),
            LinearCombination([(var, 1)]),
        )
        return AllocatedBit(var, value)

    @staticmethod
    def and_not(cs, name: str, a: "AllocatedBit", b: "AllocatedBit"):
        value = (
            None if a.value is None or b.value is None
            else wv.andn(a.value, b.value)
        )
        var = cs.alloc(f"{name}/and not result", lambda: _b2i(value))
        # a * (1 - b) = c  (boolean.rs:222)
        cs.enforce(
            f"{name}/and not constraint",
            LinearCombination([(a.variable, 1)]),
            LinearCombination([(ONE, 1), (b.variable, -1)]),
            LinearCombination([(var, 1)]),
        )
        return AllocatedBit(var, value)

    @staticmethod
    def nor(cs, name: str, a: "AllocatedBit", b: "AllocatedBit"):
        value = (
            None
            if a.value is None or b.value is None
            else wv.nor(a.value, b.value)
        )
        var = cs.alloc(f"{name}/nor result", lambda: _b2i(value))
        # (1 - a) * (1 - b) = c  (boolean.rs:260)
        cs.enforce(
            f"{name}/nor constraint",
            LinearCombination([(ONE, 1), (a.variable, -1)]),
            LinearCombination([(ONE, 1), (b.variable, -1)]),
            LinearCombination([(var, 1)]),
        )
        return AllocatedBit(var, value)


class Boolean:
    """Is(bit) | Not(bit) | Constant(bool) (boolean.rs:358+)."""

    __slots__ = ("kind", "bit", "const")

    def __init__(self, kind: str, bit=None, const=None):
        self.kind = kind  # "is" | "not" | "const"
        self.bit = bit
        self.const = const

    @staticmethod
    def from_bit(bit: AllocatedBit) -> "Boolean":
        return Boolean("is", bit=bit)

    @staticmethod
    def constant(b: bool) -> "Boolean":
        return Boolean("const", const=bool(b))

    def is_constant(self) -> bool:
        return self.kind == "const"

    def get_value(self):
        if self.kind == "const":
            return self.const
        v = self.bit.value
        if v is None:
            return None
        if wv.is_tv(v):
            return v if self.kind == "is" else wv.not_(v)
        return bool(v) if self.kind == "is" else not v

    def not_(self) -> "Boolean":
        if self.kind == "const":
            return Boolean.constant(not self.const)
        return Boolean("not" if self.kind == "is" else "is", bit=self.bit)

    def lc(self, coeff: int = 1) -> LinearCombination:
        """coeff * self as a linear combination (boolean.rs:434)."""
        if self.kind == "const":
            return (
                LinearCombination([(ONE, coeff)])
                if self.const
                else LinearCombination()
            )
        if self.kind == "is":
            return LinearCombination([(self.bit.variable, coeff)])
        return LinearCombination([(ONE, coeff), (self.bit.variable, -coeff)])

    @staticmethod
    def enforce_equal(cs, name: str, a: "Boolean", b: "Boolean"):
        from ..groth16.r1cs import Unsatisfiable

        if a.kind == "const" and b.kind == "const":
            if a.const != b.const:
                raise Unsatisfiable(name)
            return
        zero = LinearCombination()
        if (a.kind == "const" and a.const) or (b.kind == "const" and b.const):
            x = b if a.kind == "const" else a
            cs.enforce(
                f"{name}/enforce equal to one", zero, zero,
                LinearCombination([(ONE, 1)]) - x.lc(),
            )
        elif a.kind == "const" or b.kind == "const":
            x = b if a.kind == "const" else a
            cs.enforce(f"{name}/enforce equal to zero", zero, zero, x.lc())
        else:
            cs.enforce(f"{name}/enforce equal", zero, zero, a.lc() - b.lc())

    @staticmethod
    def xor(cs, name: str, a: "Boolean", b: "Boolean") -> "Boolean":
        if a.kind == "const":
            return b if not a.const else b.not_()
        if b.kind == "const":
            return a if not b.const else a.not_()
        if a.kind != b.kind:
            # a XOR (NOT b) = NOT(a XOR b)
            return Boolean.xor(cs, name, a.as_is(), b.as_is()).not_()
        return Boolean.from_bit(AllocatedBit.xor(cs, name, a.bit, b.bit))

    def as_is(self) -> "Boolean":
        """Canonical Is view (used by the xor Is/Not fold)."""
        return Boolean("is", bit=self.bit)

    @staticmethod
    def and_(cs, name: str, a: "Boolean", b: "Boolean") -> "Boolean":
        if (a.kind == "const" and not a.const) or (
            b.kind == "const" and not b.const
        ):
            return Boolean.constant(False)
        if a.kind == "const":
            return b
        if b.kind == "const":
            return a
        if a.kind == "is" and b.kind == "is":
            return Boolean.from_bit(AllocatedBit.and_(cs, name, a.bit, b.bit))
        if a.kind == "is" and b.kind == "not":
            return Boolean.from_bit(AllocatedBit.and_not(cs, name, a.bit, b.bit))
        if a.kind == "not" and b.kind == "is":
            return Boolean.from_bit(AllocatedBit.and_not(cs, name, b.bit, a.bit))
        return Boolean.from_bit(AllocatedBit.nor(cs, name, a.bit, b.bit))

    @staticmethod
    def sha256_ch(cs, name: str, a: "Boolean", b: "Boolean", c: "Boolean"):
        """(a and b) xor ((not a) and c) — 1 constraint in the generic
        case (boolean.rs:528-652)."""
        vals = (a.get_value(), b.get_value(), c.get_value())
        ch_value = (
            None
            if any(v is None for v in vals)
            else wv.xor(wv.and_(vals[0], vals[1]),
                        wv.andn(vals[2], vals[0]))
        )
        ka, kb, kc = a.kind, b.kind, c.kind
        if ka == kb == kc == "const":
            return Boolean.constant(ch_value)
        if ka == "const" and not a.const:
            return c
        if kb == "const" and not b.const:
            return Boolean.and_(cs, name, a.not_(), c)
        if kc == "const" and not c.const:
            return Boolean.and_(cs, name, a, b)
        if kc == "const":  # c is true
            return Boolean.and_(cs, name, a, b.not_()).not_()
        if kb == "const":  # b is true
            return Boolean.and_(cs, name, a.not_(), c.not_()).not_()
        # a true constant falls through, like the reference
        ch = cs.alloc(f"{name}/ch", lambda: _b2i(ch_value))
        # (b - c) * (a) = ch - c
        cs.enforce(
            f"{name}/ch computation",
            b.lc() - c.lc(),
            a.lc(),
            LinearCombination([(ch, 1)]) - c.lc(),
        )
        return Boolean.from_bit(AllocatedBit(ch, ch_value))

    @staticmethod
    def sha256_maj(cs, name: str, a: "Boolean", b: "Boolean", c: "Boolean"):
        """(a and b) xor (a and c) xor (b and c) — 2 constraints in the
        generic case (boolean.rs:654-800)."""
        vals = (a.get_value(), b.get_value(), c.get_value())
        maj_value = (
            None
            if any(v is None for v in vals)
            else (vals[0] & vals[1]) ^ (vals[0] & vals[2]) ^ (vals[1] & vals[2])
        )
        ka, kb, kc = a.kind, b.kind, c.kind
        if ka == kb == kc == "const":
            return Boolean.constant(maj_value)
        if ka == "const" and not a.const:
            return Boolean.and_(cs, name, b, c)
        if kb == "const" and not b.const:
            return Boolean.and_(cs, name, a, c)
        if kc == "const" and not c.const:
            return Boolean.and_(cs, name, a, b)
        if kc == "const":  # c true
            return Boolean.and_(cs, name, a.not_(), b.not_()).not_()
        if kb == "const":  # b true
            return Boolean.and_(cs, name, a.not_(), c.not_()).not_()
        if ka == "const":  # a true
            return Boolean.and_(cs, name, b.not_(), c.not_()).not_()
        maj = cs.alloc(f"{name}/maj", lambda: _b2i(maj_value))
        bc = Boolean.and_(cs, f"{name}/b and c", b, c)
        # (2bc - b - c) * (a) = bc - maj
        cs.enforce(
            f"{name}/maj computation",
            bc.lc(2) - b.lc() - c.lc(),
            a.lc(),
            bc.lc() - LinearCombination([(maj, 1)]),
        )
        return Boolean.from_bit(AllocatedBit(maj, maj_value))


def u64_into_boolean_vec_le(cs, name: str, value) -> list:
    """64 allocated little-endian bits (boolean.rs:274)."""
    out = []
    for i in range(64):
        b = None if value is None else wv.bit(value, i)
        out.append(Boolean.from_bit(AllocatedBit.alloc(cs, f"{name}/bit {i}", b)))
    return out


def field_into_boolean_vec_le(cs, name: str, value, num_bits: int = 255) -> list:
    """NUM_BITS allocated little-endian bits of a field element
    (boolean.rs:304-360); no packing constraint here — callers bind them."""
    out = []
    for i in range(num_bits):
        b = None if value is None else wv.bit(value, i)
        out.append(Boolean.from_bit(AllocatedBit.alloc(cs, f"{name}/bit {i}", b)))
    return out
