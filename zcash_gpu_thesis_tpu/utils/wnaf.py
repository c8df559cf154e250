"""Windowed non-adjacent form scalar representation
(re-design of ``pairing/src/wnaf.rs``).

The reference uses wNAF for the generator's batched fixed-base
exponentiations; our device path uses batched double-and-add scans, but
the host-side representation is part of the component inventory and is
used by the python-int oracles for single-point multiplications.
"""

from __future__ import annotations


def wnaf_form(scalar: int, window: int) -> list:
    """Signed digits in {-(2^w - 1) .. 2^w - 1} odd, with >= w zeros
    between nonzeros (wnaf.rs wnaf_form)."""
    out = []
    c = int(scalar)
    assert c >= 0
    while c:
        if c & 1:
            d = c % (1 << (window + 1))
            if d > 1 << window:
                d -= 1 << (window + 1)
            c -= d
        else:
            d = 0
        out.append(d)
        c >>= 1
    return out


def wnaf_table(add, neg, base, window: int) -> list:
    """Odd multiples [1, 3, 5, ...]*base up to 2^(w+1)-1 (wnaf.rs table)."""
    dbl = add(base, base)
    table = [base]
    for _ in range((1 << window) - 1):
        table.append(add(table[-1], dbl))
    return table


def wnaf_exp(add, neg, identity, base, scalar: int, window: int = 4):
    """Scalar multiplication via wNAF (wnaf.rs wnaf_exp), generic over a
    group given by (add, neg, identity)."""
    table = wnaf_table(add, neg, base, window)
    acc = identity
    for d in reversed(wnaf_form(scalar, window)):
        acc = add(acc, acc)
        if d > 0:
            acc = add(acc, table[d >> 1])
        elif d < 0:
            acc = add(acc, neg(table[(-d) >> 1]))
    return acc
