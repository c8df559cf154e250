"""Fq2/Fq6/Fq12 extension-field tower (python-int oracle).

Re-design of ``pairing/src/bls12_381/{fq2,fq6,fq12}.rs``: the pairing
tower Fq2 = Fq[u]/(u^2+1), Fq6 = Fq2[v]/(v^3 - (u+1)),
Fq12 = Fq6[w]/(w^2 - v), with Frobenius endomorphisms whose coefficients
are *computed* (nonresidue^((q^i - 1)/k)) rather than transcribed.

Cross-checked against the single-extension Fq12 in ``oracle.pairing``
(tests map w -> w and compare); the verifier uses whichever form — they
are isomorphic, and the tower matches the reference's data layout for
line-by-line parity.
"""

from __future__ import annotations

from ..constants import Q, modinv


# -- Fq2 = Fq[u]/(u^2 + 1): (c0, c1) tuples ---------------------------------


def f2_add(a, b):
    return ((a[0] + b[0]) % Q, (a[1] + b[1]) % Q)


def f2_sub(a, b):
    return ((a[0] - b[0]) % Q, (a[1] - b[1]) % Q)


def f2_neg(a):
    return ((-a[0]) % Q, (-a[1]) % Q)


def f2_mul(a, b):
    return (
        (a[0] * b[0] - a[1] * b[1]) % Q,
        (a[0] * b[1] + a[1] * b[0]) % Q,
    )


def f2_sq(a):
    return f2_mul(a, a)


def f2_inv(a):
    d = modinv((a[0] * a[0] + a[1] * a[1]) % Q, Q)
    return (a[0] * d % Q, (-a[1]) * d % Q)


def f2_mul_by_nonresidue(a):
    """* (u + 1) (fq2.rs:41-48)."""
    return ((a[0] - a[1]) % Q, (a[0] + a[1]) % Q)


def f2_pow(a, e):
    acc = (1, 0)
    while e:
        if e & 1:
            acc = f2_mul(acc, a)
        a = f2_sq(a)
        e >>= 1
    return acc


F2_ZERO = (0, 0)
F2_ONE = (1, 0)

# Frobenius coefficients, computed: (u+1)^((q^i - 1)/k).
NONRESIDUE = (1, 1)
FROB_FQ6_C1 = [f2_pow(NONRESIDUE, (Q**i - 1) // 3) for i in range(6)]
FROB_FQ6_C2 = [f2_pow(NONRESIDUE, (2 * (Q**i - 1)) // 3) for i in range(6)]
FROB_FQ12_C1 = [f2_pow(NONRESIDUE, (Q**i - 1) // 6) for i in range(12)]


def f2_frobenius(a, power):
    """conj^power: c1 *= (-1)^((q^power - 1)/2) (fq2.rs:156-159)."""
    if power % 2:
        return (a[0], (-a[1]) % Q)
    return a


# -- Fq6 = Fq2[v]/(v^3 - (u+1)): triples of Fq2 ------------------------------

F6_ZERO = (F2_ZERO, F2_ZERO, F2_ZERO)
F6_ONE = (F2_ONE, F2_ZERO, F2_ZERO)


def f6_add(a, b):
    return tuple(f2_add(x, y) for x, y in zip(a, b))


def f6_sub(a, b):
    return tuple(f2_sub(x, y) for x, y in zip(a, b))


def f6_neg(a):
    return tuple(f2_neg(x) for x in a)


def f6_mul_by_nonresidue(a):
    """* v: (c0, c1, c2) -> (c2*(u+1), c0, c1) (fq6.rs:32-38)."""
    return (f2_mul_by_nonresidue(a[2]), a[0], a[1])


def f6_mul(a, b):
    """Toom/Karatsuba form of fq6.rs:199-250."""
    a_a = f2_mul(a[0], b[0])
    b_b = f2_mul(a[1], b[1])
    c_c = f2_mul(a[2], b[2])
    t1 = f2_mul(f2_add(b[1], b[2]), f2_add(a[1], a[2]))
    t1 = f2_add(f2_mul_by_nonresidue(f2_sub(f2_sub(t1, b_b), c_c)), a_a)
    t3 = f2_mul(f2_add(b[0], b[2]), f2_add(a[0], a[2]))
    t3 = f2_add(f2_sub(f2_add(f2_sub(t3, a_a), b_b), c_c), F2_ZERO)
    t2 = f2_mul(f2_add(b[0], b[1]), f2_add(a[0], a[1]))
    t2 = f2_add(f2_sub(f2_sub(t2, a_a), b_b), f2_mul_by_nonresidue(c_c))
    return (t1, t2, t3)


def f6_sq(a):
    return f6_mul(a, a)


def f6_inv(a):
    """fq6.rs inverse: via c0,c1,c2 minors."""
    c0 = f2_sub(f2_sq(a[0]), f2_mul_by_nonresidue(f2_mul(a[1], a[2])))
    c1 = f2_sub(f2_mul_by_nonresidue(f2_sq(a[2])), f2_mul(a[0], a[1]))
    c2 = f2_sub(f2_sq(a[1]), f2_mul(a[0], a[2]))
    t = f2_add(
        f2_mul_by_nonresidue(
            f2_add(f2_mul(a[2], c1), f2_mul(a[1], c2))
        ),
        f2_mul(a[0], c0),
    )
    tinv = f2_inv(t)
    return (f2_mul(c0, tinv), f2_mul(c1, tinv), f2_mul(c2, tinv))


def f6_frobenius(a, power):
    c0 = f2_frobenius(a[0], power)
    c1 = f2_mul(f2_frobenius(a[1], power), FROB_FQ6_C1[power % 6])
    c2 = f2_mul(f2_frobenius(a[2], power), FROB_FQ6_C2[power % 6])
    return (c0, c1, c2)


# -- Fq12 = Fq6[w]/(w^2 - v): pairs of Fq6 -----------------------------------

F12_ZERO = (F6_ZERO, F6_ZERO)
F12_ONE = (F6_ONE, F6_ZERO)


def f12_add(a, b):
    return (f6_add(a[0], b[0]), f6_add(a[1], b[1]))


def f12_mul(a, b):
    """Karatsuba (fq12.rs mul_assign)."""
    aa = f6_mul(a[0], b[0])
    bb = f6_mul(a[1], b[1])
    o = f6_add(b[0], b[1])
    c1 = f6_mul(f6_add(a[1], a[0]), o)
    c1 = f6_sub(f6_sub(c1, aa), bb)
    c0 = f6_add(f6_mul_by_nonresidue(bb), aa)
    return (c0, c1)


def f12_sq(a):
    return f12_mul(a, a)


def f12_conjugate(a):
    return (a[0], f6_neg(a[1]))


def f12_inv(a):
    t = f6_sub(f6_sq(a[0]), f6_mul_by_nonresidue(f6_sq(a[1])))
    tinv = f6_inv(t)
    return (f6_mul(a[0], tinv), f6_neg(f6_mul(a[1], tinv)))


def f12_frobenius(a, power):
    c0 = f6_frobenius(a[0], power)
    c1 = f6_frobenius(a[1], power)
    coeff = FROB_FQ12_C1[power % 12]
    c1 = (f2_mul(c1[0], coeff), f2_mul(c1[1], coeff), f2_mul(c1[2], coeff))
    return (c0, c1)


def f12_pow(a, e):
    acc = F12_ONE
    while e:
        if e & 1:
            acc = f12_mul(acc, a)
        a = f12_sq(a)
        e >>= 1
    return acc


# -- isomorphism with the single-extension form (oracle.pairing.Fq12) --------


def to_single(a):
    """Tower -> Fq[w]/(w^12 - 2w^6 + 2): with v = w^2, u = w^6 - 1,
    an Fq2 element (x, y) at tower slot (i, j) contributes
    (x + y*u) * w^(2j + 6?...) — derived from c0 + c1*w over Fq6 with
    v = w^2: element = sum_{i<2, j<3} (x_{ij} + y_{ij} u) v^j w^i."""
    from .pairing import DEG, Fq12 as SingleFq12

    coeffs = [0] * DEG
    # u = w^6 - 1: (x + y u) w^k = (x - y) w^k + y w^(k+6);  k = i + 2j <= 5
    for i in range(2):  # w^i
        for j in range(3):  # v^j = w^(2j)
            x, y = a[i][j]
            k = i + 2 * j
            coeffs[k] = (coeffs[k] + x - y) % Q
            coeffs[k + 6] = (coeffs[k + 6] + y) % Q
    return SingleFq12(coeffs)
