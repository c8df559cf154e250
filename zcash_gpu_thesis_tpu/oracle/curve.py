"""Python-int elliptic-curve oracle for BLS12-381 G1/G2.

Standard-integer (non-Montgomery) affine/Jacobian group law used as ground
truth for the TPU curve kernels — the role `pairing/src/bls12_381/ec.rs`
plays for the reference's OpenCL port (`bls12-381.cl:889-1160`).
Points are tuples; ``None`` is the identity.
"""

from __future__ import annotations

from ..constants import (G1_GEN_X, G1_GEN_Y, G2_GEN_X_C0, G2_GEN_X_C1,
                         G2_GEN_Y_C0, G2_GEN_Y_C1, Q, R, modinv)


# -- Fq2 arithmetic (u^2 = -1) ------------------------------------------------

def f2_add(a, b):
    return ((a[0] + b[0]) % Q, (a[1] + b[1]) % Q)


def f2_sub(a, b):
    return ((a[0] - b[0]) % Q, (a[1] - b[1]) % Q)


def f2_mul(a, b):
    return ((a[0] * b[0] - a[1] * b[1]) % Q, (a[0] * b[1] + a[1] * b[0]) % Q)


def f2_sq(a):
    return f2_mul(a, a)


def f2_neg(a):
    return ((-a[0]) % Q, (-a[1]) % Q)


def f2_inv(a):
    d = modinv((a[0] * a[0] + a[1] * a[1]) % Q, Q)
    return (a[0] * d % Q, (-a[1]) * d % Q)


class _Fq1Ops:
    add = staticmethod(lambda a, b: (a + b) % Q)
    sub = staticmethod(lambda a, b: (a - b) % Q)
    mul = staticmethod(lambda a, b: (a * b) % Q)
    sq = staticmethod(lambda a: (a * a) % Q)
    neg = staticmethod(lambda a: (-a) % Q)
    inv = staticmethod(lambda a: modinv(a, Q))
    zero = 0
    is_zero = staticmethod(lambda a: a == 0)


class _Fq2Ops:
    add = staticmethod(f2_add)
    sub = staticmethod(f2_sub)
    mul = staticmethod(f2_mul)
    sq = staticmethod(f2_sq)
    neg = staticmethod(f2_neg)
    inv = staticmethod(f2_inv)
    zero = (0, 0)
    is_zero = staticmethod(lambda a: a == (0, 0))


def _affine_add(P, T, F):
    """Generic affine addition over field ops F; None = infinity."""
    if P is None:
        return T
    if T is None:
        return P
    x1, y1 = P
    x2, y2 = T
    if x1 == x2:
        if y1 == y2:
            if F.is_zero(y1):
                return None
            # lambda = 3x^2 / 2y
            num = F.mul(F.sq(x1), 3 if F is _Fq1Ops else (3, 0))
            lam = F.mul(num, F.inv(F.add(y1, y1)))
        else:
            return None
    else:
        lam = F.mul(F.sub(y2, y1), F.inv(F.sub(x2, x1)))
    x3 = F.sub(F.sub(F.sq(lam), x1), x2)
    y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
    return (x3, y3)


def _mul(P, k, F):
    k %= R
    acc = None
    while k:
        if k & 1:
            acc = _affine_add(acc, P, F)
        P = _affine_add(P, P, F)
        k >>= 1
    return acc


# -- G1 -----------------------------------------------------------------------

G1_GEN = (G1_GEN_X, G1_GEN_Y)


def g1_add(P, T):
    return _affine_add(P, T, _Fq1Ops)


def g1_mul(P, k):
    return _mul(P, k, _Fq1Ops)


def g1_msm(points, scalars):
    acc = None
    for P, k in zip(points, scalars):
        acc = g1_add(acc, g1_mul(P, k))
    return acc


def g1_on_curve(P):
    if P is None:
        return True
    x, y = P
    return (y * y - (x * x * x + 4)) % Q == 0


# -- G2 -----------------------------------------------------------------------

G2_GEN = ((G2_GEN_X_C0, G2_GEN_X_C1), (G2_GEN_Y_C0, G2_GEN_Y_C1))


def g2_add(P, T):
    return _affine_add(P, T, _Fq2Ops)


def g2_mul(P, k):
    return _mul(P, k, _Fq2Ops)


def g2_msm(points, scalars):
    acc = None
    for P, k in zip(points, scalars):
        acc = g2_add(acc, g2_mul(P, k))
    return acc


def g2_on_curve(P):
    if P is None:
        return True
    x, y = P
    rhs = f2_mul(f2_sq(x), x)
    rhs = ((rhs[0] + 4) % Q, (rhs[1] + 4) % Q)
    return f2_sq(y) == rhs


def random_g1_points(rng, n):
    """n pseudo-random G1 affine points (multiples of the generator)."""
    return [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]


def random_g2_points(rng, n):
    return [g2_mul(G2_GEN, rng.randrange(1, R)) for _ in range(n)]
