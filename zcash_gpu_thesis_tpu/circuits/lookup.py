"""Window-table lookup gadgets (re-design of ``circuit/lookup.rs``).

``lookup3_xy``: 3-bit table lookup of fixed (x, y) coordinate pairs —
2 allocations + 1 AND + 2 constraints.
``lookup3_xy_with_conditional_negation``: 2-bit lookup with a sign bit —
the x result is a free linear combination, y costs 1 allocation + 1 AND +
1 constraint.
"""

from __future__ import annotations

from .. import wv
from ..constants import R as FR
from ..groth16.r1cs import ONE, LinearCombination
from .boolean import Boolean
from .num import AllocatedNum, Num


def synth(window_size: int, constants, assignment):
    """Multilinear coefficient synthesis (lookup.rs:14-33): after this,
    sum over subsets S of set-bits of i of assignment[S] == constants[i]."""
    assert len(assignment) == 1 << window_size
    for i, constant in enumerate(constants):
        cur = (constant - assignment[i]) % FR
        assignment[i] = cur
        for j in range(i + 1, len(assignment)):
            if j & i == i:
                assignment[j] = (assignment[j] + cur) % FR


def lookup3_xy(cs, name: str, bits, coords):
    """3-bit lookup into 8 fixed points (lookup.rs:37-120)."""
    assert len(bits) == 3 and len(coords) == 8
    vals = [b.get_value() for b in bits]
    missing = any(v is None for v in vals)
    x_sel = None if missing else wv.sel_table(vals, [c[0] for c in coords])
    y_sel = None if missing else wv.sel_table(vals, [c[1] for c in coords])
    res_x = AllocatedNum.alloc(cs, f"{name}/x", lambda: x_sel)
    res_y = AllocatedNum.alloc(cs, f"{name}/y", lambda: y_sel)
    x_coeffs = [0] * 8
    y_coeffs = [0] * 8
    synth(3, [c[0] for c in coords], x_coeffs)
    synth(3, [c[1] for c in coords], y_coeffs)

    precomp = Boolean.and_(cs, f"{name}/precomp", bits[1], bits[2])

    for which, res, coeffs in (("x", res_x, x_coeffs), ("y", res_y, y_coeffs)):
        cs.enforce(
            f"{name}/{which}-coordinate lookup",
            LinearCombination([(ONE, coeffs[0b001])])
            + bits[1].lc(coeffs[0b011])
            + bits[2].lc(coeffs[0b101])
            + precomp.lc(coeffs[0b111]),
            bits[0].lc(1),
            LinearCombination([(res.variable, 1), (ONE, -coeffs[0b000])])
            - bits[1].lc(coeffs[0b010])
            - bits[2].lc(coeffs[0b100])
            - precomp.lc(coeffs[0b110]),
        )
    return res_x, res_y


def lookup3_xy_with_conditional_negation(cs, name: str, bits, coords):
    """2-bit lookup + sign bit into 4 fixed points (lookup.rs:124-193).
    Returns (Num x, Num y)."""
    assert len(bits) == 3 and len(coords) == 4
    v0, v1, v2 = (b.get_value() for b in bits)

    def yval():
        if v0 is None or v1 is None or v2 is None:
            return None
        tmp = wv.sel_table([v0, v1], [c[1] for c in coords])
        return wv.select(v2, wv.neg(tmp), tmp)

    y = AllocatedNum.alloc(cs, f"{name}/y", yval)

    x_coeffs = [0] * 4
    y_coeffs = [0] * 4
    synth(2, [c[0] for c in coords], x_coeffs)
    synth(2, [c[1] for c in coords], y_coeffs)

    precomp = Boolean.and_(cs, f"{name}/precomp", bits[0], bits[1])

    x = (
        Num.zero()
        .add_bool_with_coeff(ONE, Boolean.constant(True), x_coeffs[0b00])
        .add_bool_with_coeff(ONE, bits[0], x_coeffs[0b01])
        .add_bool_with_coeff(ONE, bits[1], x_coeffs[0b10])
        .add_bool_with_coeff(ONE, precomp, x_coeffs[0b11])
    )
    y_lc = (
        precomp.lc(y_coeffs[0b11])
        + bits[1].lc(y_coeffs[0b10])
        + bits[0].lc(y_coeffs[0b01])
        + LinearCombination([(ONE, y_coeffs[0b00])])
    )
    # (2 * y_lc) * (sign) = y_lc - y
    cs.enforce(
        f"{name}/y-coordinate lookup",
        y_lc + y_lc,
        bits[2].lc(1),
        y_lc - LinearCombination([(y.variable, 1)]),
    )
    return x, Num.from_num(y)
