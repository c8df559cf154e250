"""Jubjub point gadgets (re-design of ``circuit/ecc.rs``).

``EdwardsPoint``: witnessing (with on-curve interpretation), conditional
select, add (3 allocations + U/A/B/C constraints = 6 constraints),
double (5), scalar mul, fixed-base mul over the 3-bit window tables;
``MontgomeryPoint``: affine add (3 constraints, undefined for coincident
points — used only in the Pedersen hash accumulation) and conversion
into Edwards form (2 constraints).
"""

from __future__ import annotations

from .. import wv
from ..constants import R as FR
from ..constants import modinv
from ..groth16.r1cs import ONE, LinearCombination, SynthesisError
from ..protocol import jubjub as J
from .boolean import Boolean
from .lookup import lookup3_xy
from .num import AllocatedNum, Num


def _inv_or_none(v):
    if v is None:
        return None
    if wv.is_tv(v):
        return wv.inv(v)  # a zero flags the tape replay
    return modinv(v, FR) if v % FR else None


class EdwardsPoint:
    def __init__(self, x: AllocatedNum, y: AllocatedNum):
        self.x = x
        self.y = y

    # -- construction -------------------------------------------------------

    @staticmethod
    def witness(cs, name: str, p, check: bool = True) -> "EdwardsPoint":
        """Allocate (x, y) and interpret on-curve (ecc.rs:161-194).
        `p` is an (x, y) int pair or None."""
        x = AllocatedNum.alloc(cs, f"{name}/x",
                               lambda: None if p is None else p[0])
        y = AllocatedNum.alloc(cs, f"{name}/y",
                               lambda: None if p is None else p[1])
        return EdwardsPoint.interpret(cs, f"{name}/point interpretation", x, y)

    @staticmethod
    def interpret(cs, name: str, x: AllocatedNum, y: AllocatedNum):
        """-x^2 + y^2 = 1 + d x^2 y^2: 4 constraints (ecc.rs:304-332)."""
        x2 = x.square(cs, f"{name}/x^2")
        y2 = y.square(cs, f"{name}/y^2")
        x2y2 = x2.mul(cs, f"{name}/x^2 y^2", y2)
        cs.enforce(
            f"{name}/on curve check",
            LinearCombination([(x2.variable, -1), (y2.variable, 1)]),
            LinearCombination([(ONE, 1)]),
            LinearCombination([(ONE, 1), (x2y2.variable, J.EDWARDS_D)]),
        )
        return EdwardsPoint(x, y)

    # -- protocol helpers ---------------------------------------------------

    def assert_not_small_order(self, cs, name: str):
        """Three doublings then x != 0 (ecc.rs:95-122)."""
        tmp = self.double(cs, f"{name}/first doubling")
        tmp = tmp.double(cs, f"{name}/second doubling")
        tmp = tmp.double(cs, f"{name}/third doubling")
        tmp.x.assert_nonzero(cs, f"{name}/check x != 0")

    def inputize(self, cs, name: str):
        self.x.inputize(cs, f"{name}/x")
        self.y.inputize(cs, f"{name}/y")

    def repr_(self, cs, name: str) -> list:
        """y bits (strict LE) plus the x sign bit (ecc.rs:137-159)."""
        x = self.x.into_bits_le_strict(cs, f"{name}/unpack x")
        y = self.y.into_bits_le_strict(cs, f"{name}/unpack y")
        return y + [x[0]]

    def conditionally_select(self, cs, name: str, condition: Boolean):
        """self if condition else (0, 1): 2 constraints (ecc.rs:196-250)."""
        cv = condition.get_value()

        def xval():
            if cv is None or self.x.value is None:
                return None
            return wv.select(cv, self.x.value, 0)

        x_prime = AllocatedNum.alloc(cs, f"{name}/x'", xval)
        cs.enforce(
            f"{name}/x' computation",
            LinearCombination([(self.x.variable, 1)]),
            condition.lc(),
            LinearCombination([(x_prime.variable, 1)]),
        )

        def yval():
            if cv is None or self.y.value is None:
                return None
            return wv.select(cv, self.y.value, 1)

        y_prime = AllocatedNum.alloc(cs, f"{name}/y'", yval)
        cs.enforce(
            f"{name}/y' computation",
            LinearCombination([(self.y.variable, 1)]),
            condition.lc(),
            LinearCombination([(y_prime.variable, 1)]) - condition.not_().lc(),
        )
        return EdwardsPoint(x_prime, y_prime)

    # -- group law ----------------------------------------------------------

    def double(self, cs, name: str) -> "EdwardsPoint":
        """5 constraints (ecc.rs:334-447)."""
        xv, yv = self.x.value, self.y.value

        def tval():
            if xv is None or yv is None:
                return None
            return (xv + yv) * (xv + yv) % FR

        t = AllocatedNum.alloc(cs, f"{name}/T", tval)
        cs.enforce(
            f"{name}/T computation",
            LinearCombination([(self.x.variable, 1), (self.y.variable, 1)]),
            LinearCombination([(self.x.variable, 1), (self.y.variable, 1)]),
            LinearCombination([(t.variable, 1)]),
        )
        a = self.x.mul(cs, f"{name}/A computation", self.y)

        def cval():
            if a.value is None:
                return None
            return a.value * a.value % FR * J.EDWARDS_D % FR

        c = AllocatedNum.alloc(cs, f"{name}/C", cval)
        cs.enforce(
            f"{name}/C computation",
            LinearCombination([(a.variable, J.EDWARDS_D)]),
            LinearCombination([(a.variable, 1)]),
            LinearCombination([(c.variable, 1)]),
        )

        def x3val():
            if a.value is None or c.value is None:
                return None
            inv = _inv_or_none((1 + c.value) % FR)
            if inv is None:
                raise SynthesisError(f"{name}: division by zero")
            return 2 * a.value * inv % FR

        x3 = AllocatedNum.alloc(cs, f"{name}/x3", x3val)
        cs.enforce(
            f"{name}/x3 computation",
            LinearCombination([(ONE, 1), (c.variable, 1)]),
            LinearCombination([(x3.variable, 1)]),
            LinearCombination([(a.variable, 2)]),
        )

        def y3val():
            if a.value is None or c.value is None or t.value is None:
                return None
            inv = _inv_or_none((1 - c.value) % FR)
            if inv is None:
                raise SynthesisError(f"{name}: division by zero")
            return (t.value - 2 * a.value) * inv % FR

        y3 = AllocatedNum.alloc(cs, f"{name}/y3", y3val)
        cs.enforce(
            f"{name}/y3 computation",
            LinearCombination([(ONE, 1), (c.variable, -1)]),
            LinearCombination([(y3.variable, 1)]),
            LinearCombination([(t.variable, 1), (a.variable, -2)]),
        )
        return EdwardsPoint(x3, y3)

    def add(self, cs, name: str, other: "EdwardsPoint") -> "EdwardsPoint":
        """Complete Edwards addition: 6 constraints (ecc.rs:449-574)."""
        x1, y1 = self.x.value, self.y.value
        x2, y2 = other.x.value, other.y.value

        def uval():
            if None in (x1, y1, x2, y2):
                return None
            return (x1 + y1) * (x2 + y2) % FR

        u = AllocatedNum.alloc(cs, f"{name}/U", uval)
        cs.enforce(
            f"{name}/U computation",
            LinearCombination([(self.x.variable, 1), (self.y.variable, 1)]),
            LinearCombination([(other.x.variable, 1), (other.y.variable, 1)]),
            LinearCombination([(u.variable, 1)]),
        )
        a = other.y.mul(cs, f"{name}/A computation", self.x)
        b = other.x.mul(cs, f"{name}/B computation", self.y)

        def cval():
            if a.value is None or b.value is None:
                return None
            return a.value * b.value % FR * J.EDWARDS_D % FR

        c = AllocatedNum.alloc(cs, f"{name}/C", cval)
        cs.enforce(
            f"{name}/C computation",
            LinearCombination([(a.variable, J.EDWARDS_D)]),
            LinearCombination([(b.variable, 1)]),
            LinearCombination([(c.variable, 1)]),
        )

        def x3val():
            if a.value is None or b.value is None or c.value is None:
                return None
            inv = _inv_or_none((1 + c.value) % FR)
            if inv is None:
                raise SynthesisError(f"{name}: division by zero")
            return (a.value + b.value) * inv % FR

        x3 = AllocatedNum.alloc(cs, f"{name}/x3", x3val)
        cs.enforce(
            f"{name}/x3 computation",
            LinearCombination([(ONE, 1), (c.variable, 1)]),
            LinearCombination([(x3.variable, 1)]),
            LinearCombination([(a.variable, 1), (b.variable, 1)]),
        )

        def y3val():
            if None in (a.value, b.value, c.value) or u.value is None:
                return None
            inv = _inv_or_none((1 - c.value) % FR)
            if inv is None:
                raise SynthesisError(f"{name}: division by zero")
            return (u.value - a.value - b.value) * inv % FR

        y3 = AllocatedNum.alloc(cs, f"{name}/y3", y3val)
        cs.enforce(
            f"{name}/y3 computation",
            LinearCombination([(ONE, 1), (c.variable, -1)]),
            LinearCombination([(y3.variable, 1)]),
            LinearCombination(
                [(u.variable, 1), (a.variable, -1), (b.variable, -1)]
            ),
        )
        return EdwardsPoint(x3, y3)

    def mul(self, cs, name: str, by) -> "EdwardsPoint":
        """Scalar mul over LE boolean bits (ecc.rs:252-302)."""
        curbase = None
        result = None
        for i, bit in enumerate(by):
            if curbase is None:
                curbase = self
            else:
                curbase = curbase.double(cs, f"{name}/doubling {i}")
            thisbase = curbase.conditionally_select(
                cs, f"{name}/selection {i}", bit
            )
            if result is None:
                result = thisbase
            else:
                result = result.add(cs, f"{name}/addition {i}", thisbase)
        assert result is not None
        return result

    def get_value(self):
        if self.x.value is None or self.y.value is None:
            return None
        return (self.x.value, self.y.value)


def fixed_base_multiplication(cs, name: str, base_idx: int, by) -> EdwardsPoint:
    """3-bit-window fixed-base mul over the precomputed circuit generators
    (ecc.rs:41-85)."""
    windows = J.JubjubParams().fixed_base_circuit_generators[base_idx]
    result = None
    chunks = [by[i : i + 3] for i in range(0, len(by), 3)]
    for i, (chunk, window) in enumerate(zip(chunks, windows)):
        while len(chunk) < 3:
            chunk = chunk + [Boolean.constant(False)]
        x, y = lookup3_xy(cs, f"{name}/window table lookup {i}", chunk, window)
        p = EdwardsPoint(x, y)
        if result is None:
            result = p
        else:
            result = result.add(cs, f"{name}/addition {i}", p)
    assert result is not None
    return result


class MontgomeryPoint:
    def __init__(self, x: Num, y: Num):
        self.x = x
        self.y = y

    @staticmethod
    def interpret_unchecked(x: Num, y: Num) -> "MontgomeryPoint":
        return MontgomeryPoint(x, y)

    def into_edwards(self, cs, name: str) -> EdwardsPoint:
        """(u, v) = (scale*x/y, (x-1)/(x+1)): 2 constraints
        (ecc.rs:576-644)."""
        xv, yv = self.x.get_value(), self.y.get_value()

        def uval():
            if xv is None or yv is None:
                return None
            inv = _inv_or_none(yv)
            if inv is None:
                raise SynthesisError(f"{name}: division by zero")
            return xv * J.MONTGOMERY_SCALE % FR * inv % FR

        u = AllocatedNum.alloc(cs, f"{name}/u", uval)
        cs.enforce(
            f"{name}/u computation",
            self.y.lc(1),
            LinearCombination([(u.variable, 1)]),
            self.x.lc(J.MONTGOMERY_SCALE),
        )

        def vval():
            if xv is None:
                return None
            inv = _inv_or_none((xv + 1) % FR)
            if inv is None:
                raise SynthesisError(f"{name}: division by zero")
            return (xv - 1) * inv % FR

        v = AllocatedNum.alloc(cs, f"{name}/v", vval)
        cs.enforce(
            f"{name}/v computation",
            self.x.lc(1) + LinearCombination([(ONE, 1)]),
            LinearCombination([(v.variable, 1)]),
            self.x.lc(1) - LinearCombination([(ONE, 1)]),
        )
        return EdwardsPoint(u, v)

    def add(self, cs, name: str, other: "MontgomeryPoint") -> "MontgomeryPoint":
        """Affine Montgomery addition, 3 constraints; undefined for
        coincident points (ecc.rs:659-750)."""
        sx, sy = self.x.get_value(), self.y.get_value()
        ox, oy = other.x.get_value(), other.y.get_value()

        def lval():
            if None in (sx, sy, ox, oy):
                return None
            inv = _inv_or_none((ox - sx) % FR)
            if inv is None:
                raise SynthesisError(f"{name}: division by zero")
            return (oy - sy) * inv % FR

        lam = AllocatedNum.alloc(cs, f"{name}/lambda", lval)
        cs.enforce(
            f"{name}/evaluate lambda",
            other.x.lc(1) - self.x.lc(1),
            LinearCombination([(lam.variable, 1)]),
            other.y.lc(1) - self.y.lc(1),
        )

        def xpval():
            if lam.value is None or sx is None or ox is None:
                return None
            return (lam.value * lam.value - J.MONTGOMERY_A - sx - ox) % FR

        xprime = AllocatedNum.alloc(cs, f"{name}/xprime", xpval)
        cs.enforce(
            f"{name}/evaluate xprime",
            LinearCombination([(lam.variable, 1)]),
            LinearCombination([(lam.variable, 1)]),
            LinearCombination([(ONE, J.MONTGOMERY_A), (xprime.variable, 1)])
            + self.x.lc(1)
            + other.x.lc(1),
        )

        def ypval():
            if xprime.value is None or sx is None or sy is None or lam.value is None:
                return None
            return (-((xprime.value - sx) * lam.value + sy)) % FR

        yprime = AllocatedNum.alloc(cs, f"{name}/yprime", ypval)
        cs.enforce(
            f"{name}/evaluate yprime",
            self.x.lc(1) - LinearCombination([(xprime.variable, 1)]),
            LinearCombination([(lam.variable, 1)]),
            LinearCombination([(yprime.variable, 1)]) + self.y.lc(1),
        )
        return MontgomeryPoint(Num.from_num(xprime), Num.from_num(yprime))
