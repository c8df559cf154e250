"""UInt32 gadget (re-design of ``circuit/uint32.rs``).

A 32-bit word as little-endian Booleans: free rotr/shr, bitwise xor /
sha256 ch / maj, and `addmany` modular addition whose carry equality is
batched through MultiEq.
"""

from __future__ import annotations

from typing import Optional

from .. import wv
from ..groth16.r1cs import LinearCombination
from .boolean import AllocatedBit, Boolean
from .multieq import MultiEq


class UInt32:
    def __init__(self, bits, value: Optional[int]):
        assert len(bits) == 32
        self.bits = list(bits)  # little-endian
        # traced values are < 2^32 by construction (every wv word op
        # masks); skip the redundant mask op on the tape
        self.value = (value if value is None or wv.is_tv(value)
                      else value & 0xFFFFFFFF)

    @staticmethod
    def constant(value: int) -> "UInt32":
        return UInt32(
            [Boolean.constant(bool((value >> i) & 1)) for i in range(32)],
            value,
        )

    @staticmethod
    def alloc(cs, name: str, value: Optional[int]) -> "UInt32":
        bits = [
            Boolean.from_bit(
                AllocatedBit.alloc(
                    cs, f"{name}/allocated bit {i}",
                    None if value is None else wv.bit(value, i),
                )
            )
            for i in range(32)
        ]
        return UInt32(bits, value)

    def into_bits_be(self):
        return list(reversed(self.bits))

    @staticmethod
    def from_bits_be(bits) -> "UInt32":
        assert len(bits) == 32
        vals = [b.get_value() for b in bits]
        value = (
            None if any(v is None for v in vals)
            else wv.pack_bits_le(list(reversed(vals)))
        )
        return UInt32(list(reversed(bits)), value)

    def into_bits(self):
        return list(self.bits)

    @staticmethod
    def from_bits(bits) -> "UInt32":
        assert len(bits) == 32
        vals = [b.get_value() for b in bits]
        value = (
            None if any(v is None for v in vals)
            else wv.pack_bits_le(vals)
        )
        return UInt32(list(bits), value)

    def rotr(self, by: int) -> "UInt32":
        by %= 32
        new_bits = [self.bits[(i + by) % 32] for i in range(32)]
        value = None if self.value is None else wv.rotr32(self.value, by)
        return UInt32(new_bits, value)

    def shr(self, by: int) -> "UInt32":
        by %= 32
        fill = Boolean.constant(False)
        new_bits = [
            self.bits[i + by] if i + by < 32 else fill for i in range(32)
        ]
        value = None if self.value is None else wv.shr(self.value, by)
        return UInt32(new_bits, value)

    def xor(self, cs, name: str, other: "UInt32") -> "UInt32":
        value = (
            None
            if self.value is None or other.value is None
            else self.value ^ other.value
        )
        bits = [
            Boolean.xor(cs, f"{name}/xor of bit {i}", a, b)
            for i, (a, b) in enumerate(zip(self.bits, other.bits))
        ]
        return UInt32(bits, value)

    @staticmethod
    def sha256_maj(cs, name: str, a: "UInt32", b: "UInt32", c: "UInt32"):
        value = (
            None
            if None in (a.value, b.value, c.value)
            else wv.maj32(a.value, b.value, c.value)
        )
        bits = [
            Boolean.sha256_maj(cs, f"{name}/maj {i}", x, y, z)
            for i, (x, y, z) in enumerate(zip(a.bits, b.bits, c.bits))
        ]
        return UInt32(bits, value)

    @staticmethod
    def sha256_ch(cs, name: str, a: "UInt32", b: "UInt32", c: "UInt32"):
        value = (
            None
            if None in (a.value, b.value, c.value)
            else wv.ch32(a.value, b.value, c.value)
        )
        bits = [
            Boolean.sha256_ch(cs, f"{name}/ch {i}", x, y, z)
            for i, (x, y, z) in enumerate(zip(a.bits, b.bits, c.bits))
        ]
        return UInt32(bits, value)

    @staticmethod
    def addmany(mcs: MultiEq, name: str, operands) -> "UInt32":
        """Modular sum of 2..10 UInt32s (uint32.rs:310-420): allocate
        32+carry result bits, equality batched via MultiEq."""
        assert 2 <= len(operands) <= 10
        max_value = len(operands) * 0xFFFFFFFF
        result_value = 0
        lc = LinearCombination()
        all_constants = True
        for op in operands:
            if op.value is None:
                result_value = None
            elif result_value is not None:
                result_value += op.value
            coeff = 1
            for bit in op.bits:
                lc = lc + bit.lc(coeff)
                all_constants &= bit.is_constant()
                coeff <<= 1

        modular_value = (
            None if result_value is None else wv.and_(result_value,
                                                      0xFFFFFFFF)
        )
        if all_constants and modular_value is not None:
            return UInt32.constant(modular_value)

        result_bits = []
        result_lc = LinearCombination()
        coeff = 1
        i = 0
        while max_value:
            b = AllocatedBit.alloc(
                mcs, f"{name}/result bit {i}",
                None if result_value is None else wv.bit(result_value, i),
            )
            result_lc = result_lc + LinearCombination([(b.variable, coeff)])
            result_bits.append(Boolean.from_bit(b))
            max_value >>= 1
            i += 1
            coeff <<= 1

        mcs.enforce_equal(i, lc, result_lc)
        return UInt32(result_bits[:32], modular_value)
