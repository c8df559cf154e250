"""Field-element gadgets (re-design of ``circuit/num.rs``).

``AllocatedNum`` wraps one variable holding an Fr element; ``Num`` is a
free linear-combination accumulator.  Values are python ints mod r or
None.  Constraint shapes match the reference exactly.
"""

from __future__ import annotations

from typing import Optional

from .. import wv
from ..constants import R as FR
from ..constants import modinv
from ..groth16.r1cs import ONE, LinearCombination, SynthesisError, Variable
from .boolean import AllocatedBit, Boolean


class AllocatedNum:
    def __init__(self, variable: Variable, value: Optional[int]):
        self.variable = variable
        self.value = None if value is None else value % FR

    @staticmethod
    def alloc(cs, name: str, value_fn) -> "AllocatedNum":
        value = value_fn()
        var = cs.alloc(
            f"{name}/num", (lambda: None) if value is None else (lambda: value)
        )
        return AllocatedNum(var, value)

    def inputize(self, cs, name: str):
        """Re-allocate as a public input bound by an equality constraint
        (num.rs:63-86)."""
        v = self.value
        inp = cs.alloc_input(f"{name}/input variable", lambda: v)
        cs.enforce(
            f"{name}/enforce input is correct",
            LinearCombination([(inp, 1)]),
            LinearCombination([(ONE, 1)]),
            LinearCombination([(self.variable, 1)]),
        )

    def mul(self, cs, name: str, other: "AllocatedNum") -> "AllocatedNum":
        value = (
            None
            if self.value is None or other.value is None
            else self.value * other.value % FR
        )
        var = cs.alloc(f"{name}/product num", lambda: value)
        cs.enforce(
            f"{name}/multiplication constraint",
            LinearCombination([(self.variable, 1)]),
            LinearCombination([(other.variable, 1)]),
            LinearCombination([(var, 1)]),
        )
        return AllocatedNum(var, value)

    def square(self, cs, name: str) -> "AllocatedNum":
        value = None if self.value is None else self.value * self.value % FR
        var = cs.alloc(f"{name}/squared num", lambda: value)
        cs.enforce(
            f"{name}/squaring constraint",
            LinearCombination([(self.variable, 1)]),
            LinearCombination([(self.variable, 1)]),
            LinearCombination([(var, 1)]),
        )
        return AllocatedNum(var, value)

    def assert_nonzero(self, cs, name: str):
        v = self.value
        if v is None:
            inv = None
        elif wv.is_tv(v):
            inv = wv.inv(v)  # zero flags the tape replay, not the trace
        else:
            inv = modinv(v, FR) if v else None
        if not wv.is_tv(v) and v == 0:
            # DivisionByZero at witness time (num.rs:318-327)
            def bad():
                raise SynthesisError(f"{name}: division by zero")

            var = cs.alloc(f"{name}/ephemeral inverse", bad)
        else:
            var = cs.alloc(f"{name}/ephemeral inverse", lambda: inv)
        cs.enforce(
            f"{name}/nonzero assertion constraint",
            LinearCombination([(self.variable, 1)]),
            LinearCombination([(var, 1)]),
            LinearCombination([(ONE, 1)]),
        )

    @staticmethod
    def conditionally_reverse(cs, name: str, a: "AllocatedNum",
                              b: "AllocatedNum", condition: Boolean):
        """(b, a) if condition else (a, b) — 2 constraints (num.rs:350)."""
        cv = condition.get_value()

        def cval():
            if cv is None or a.value is None or b.value is None:
                return None
            return wv.select(cv, b.value, a.value)

        c = AllocatedNum.alloc(cs, f"{name}/conditional reversal result 1", cval)
        cs.enforce(
            f"{name}/first conditional reversal",
            LinearCombination([(a.variable, 1), (b.variable, -1)]),
            condition.lc(),
            LinearCombination([(a.variable, 1), (c.variable, -1)]),
        )

        def dval():
            if cv is None or a.value is None or b.value is None:
                return None
            return wv.select(cv, a.value, b.value)

        d = AllocatedNum.alloc(cs, f"{name}/conditional reversal result 2", dval)
        cs.enforce(
            f"{name}/second conditional reversal",
            LinearCombination([(b.variable, 1), (a.variable, -1)]),
            condition.lc(),
            LinearCombination([(b.variable, 1), (d.variable, -1)]),
        )
        return c, d

    def into_bits_le(self, cs, name: str) -> list:
        """255 allocated LE bits + one packing constraint (num.rs:223-253);
        does NOT enforce canonicity in the field."""
        from .boolean import field_into_boolean_vec_le

        bits = field_into_boolean_vec_le(cs, name, self.value)
        lc = LinearCombination()
        coeff = 1
        for b in bits:
            lc = lc + LinearCombination([(b.bit.variable, coeff)])
            coeff = coeff * 2 % FR
        lc = lc - LinearCombination([(self.variable, 1)])
        zero = LinearCombination()
        cs.enforce(f"{name}/unpacking constraint", zero, zero, lc)
        return bits

    def into_bits_le_strict(self, cs, name: str) -> list:
        """Strict unpacking: the bit string must be < r (num.rs:91-221).

        Walks the big-endian bits of r-1; bits under a "run of ones" are
        plain booleans k-ary-ANDed, bits at zero positions are allocated
        conditionally on the preceding run being all-ones.
        """

        def kary_and(name2, bits_):
            cur = None
            for i, v in enumerate(bits_):
                cur = v if cur is None else AllocatedBit.and_(
                    cs, f"{name2}/and {i}", cur, v
                )
            return cur

        char_minus_one = FR - 1
        nbits = FR.bit_length()  # 255
        a_val = self.value
        result = []
        last_run = None
        current_run = []
        i = 0
        for pos in range(nbits - 1, -1, -1):
            b = (char_minus_one >> pos) & 1
            a_bit = None if a_val is None else wv.bit(a_val, pos)
            if b:
                bit = AllocatedBit.alloc(cs, f"{name}/bit {i}", a_bit)
                current_run.append(bit)
                result.append(bit)
            else:
                if current_run:
                    if last_run is not None:
                        current_run.append(last_run)
                    last_run = kary_and(f"{name}/run ending at {i}", current_run)
                    current_run = []
                bit = AllocatedBit.alloc_conditionally(
                    cs, f"{name}/bit {i}", a_bit, last_run
                )
                result.append(bit)
            i += 1

        assert not current_run  # r is prime: ends on a zero run

        lc = LinearCombination()
        coeff = 1
        for bit in reversed(result):
            lc = lc + LinearCombination([(bit.variable, coeff)])
            coeff = coeff * 2 % FR
        lc = lc - LinearCombination([(self.variable, 1)])
        zero = LinearCombination()
        cs.enforce(f"{name}/unpacking constraint", zero, zero, lc)

        return [Boolean.from_bit(b) for b in reversed(result)]

    def get_value(self):
        return self.value

    def get_variable(self):
        return self.variable


class Num:
    """Free linear accumulator (num.rs:406-467)."""

    def __init__(self, value: Optional[int] = 0,
                 lc: Optional[LinearCombination] = None):
        self.value = value if value is None else value % FR
        self._lc = lc if lc is not None else LinearCombination()

    @staticmethod
    def zero() -> "Num":
        return Num(0, LinearCombination())

    @staticmethod
    def from_num(num: AllocatedNum) -> "Num":
        return Num(num.value, LinearCombination([(num.variable, 1)]))

    def get_value(self):
        return self.value

    def lc(self, coeff: int = 1) -> LinearCombination:
        return LinearCombination([(v, c * coeff) for (v, c) in self._lc.terms])

    def add_bool_with_coeff(self, one: Variable, bit: Boolean,
                            coeff: int) -> "Num":
        bv = bit.get_value()
        if self.value is None or bv is None:
            value = None
        else:
            value = wv.add_if(self.value, bv, coeff)
        return Num(value, self._lc + bit.lc(coeff))
