"""Python-int BLS12-381 pairing (host-side, verification only).

The reference computes pairings only on the CPU for proof verification
(`pairing/src/bls12_381/mod.rs:28-110`: Miller loop + final
exponentiation); they were never ported to the GPU.  We keep the same
split: proving runs on TPU, the handful of verifier pairings run here as
exact python-int arithmetic.

Representation: Fq12 = Fq[w] / (w^12 - 2 w^6 + 2), the single-extension
form of the tower Fq2(u) -> Fq6(v) -> Fq12(w) with u^2 = -1,
v^3 = u + 1, w^2 = v (so w^6 = u + 1 and the minimal polynomial of w is
w^12 - 2 w^6 + 2).  G2 points over Fq2 are "untwisted" into E(Fq12)
through the isomorphism u |-> w^6 - 1.
"""

from __future__ import annotations

import functools

from ..constants import BLS_X, Q, R

DEG = 12
# w^12 = 2 w^6 - 2  (coefficients of the reduction rule)
_W12 = [(-2) % Q, 0, 0, 0, 0, 0, 2, 0, 0, 0, 0, 0]


def _poly_mul(a, b):
    out = [0] * (2 * DEG - 1)
    for i, x in enumerate(a):
        if x:
            for j, y in enumerate(b):
                out[i + j] = (out[i + j] + x * y) % Q
    # reduce degree >= 12 using w^12 = 2w^6 - 2 repeatedly
    for k in range(len(out) - 1, DEG - 1, -1):
        c = out[k]
        if c:
            out[k] = 0
            for j, m in enumerate(_W12):
                out[k - DEG + j] = (out[k - DEG + j] + c * m) % Q
    return out[:DEG]


class Fq12:
    __slots__ = ("c",)

    def __init__(self, coeffs):
        self.c = [x % Q for x in coeffs] + [0] * (DEG - len(coeffs))

    @staticmethod
    def one():
        return Fq12([1])

    @staticmethod
    def zero():
        return Fq12([])

    def __eq__(self, o):
        return self.c == o.c

    def __mul__(self, o):
        if isinstance(o, int):
            return Fq12([x * o for x in self.c])
        return Fq12(_poly_mul(self.c, o.c))

    __rmul__ = __mul__

    def __add__(self, o):
        return Fq12([x + y for x, y in zip(self.c, o.c)])

    def __sub__(self, o):
        return Fq12([x - y for x, y in zip(self.c, o.c)])

    def __neg__(self):
        return Fq12([-x for x in self.c])

    def is_zero(self):
        return all(x == 0 for x in self.c)

    def square(self):
        return self * self

    def pow(self, e: int):
        e = int(e)
        if e < 0:
            return self.inv().pow(-e)
        acc = Fq12.one()
        base = self
        while e:
            if e & 1:
                acc = acc * base
            base = base * base
            e >>= 1
        return acc

    def inv(self):
        """Extended Euclid over Fq[x] modulo the minimal polynomial."""
        lm, hm = [1] + [0] * DEG, [0] * (DEG + 1)
        low = self.c + [0]
        high = [(-x) % Q for x in _W12] + [0]
        high[DEG] = 1  # w^12 - 2w^6 + 2
        while _deg(low):
            r = _poly_div(high, low)
            nm, new = list(hm), list(high)
            for i in range(DEG + 1):
                for j in range(DEG + 1 - i):
                    nm[i + j] = (nm[i + j] - lm[i] * r[j]) % Q
                    new[i + j] = (new[i + j] - low[i] * r[j]) % Q
            lm, low, hm, high = nm, new, lm, low
        c0inv = pow(low[0], Q - 2, Q)
        return Fq12([x * c0inv for x in lm[:DEG]])


def _deg(p):
    d = len(p) - 1
    while d and p[d] == 0:
        d -= 1
    return d


def _poly_div(a, b):
    """Polynomial division (quotient only) over Fq."""
    a = list(a)
    out = [0] * len(a)
    da, db = _deg(a), _deg(b)
    binv = pow(b[db], Q - 2, Q)
    for i in range(da - db, -1, -1):
        out[i] = (out[i] + a[db + i] * binv) % Q
        for j in range(db + 1):
            a[i + j] = (a[i + j] - out[i] * b[j]) % Q
    return out[: DEG + 1]


# -- curve over Fq12 (points as (Fq12, Fq12) tuples, None = infinity) --------


def _ec_add(P, T):
    if P is None:
        return T
    if T is None:
        return P
    x1, y1 = P
    x2, y2 = T
    if x1 == x2:
        if y1 == y2:
            if y1.is_zero():
                return None
            m = (3 * x1.square()) * (2 * y1).inv()
        else:
            return None
    else:
        m = (y2 - y1) * (x2 - x1).inv()
    x3 = m.square() - x1 - x2
    y3 = m * (x1 - x3) - y1
    return (x3, y3)


def _ec_double(P):
    return _ec_add(P, P)


def _linefunc(P1, P2, T):
    """Evaluate the line through P1, P2 at T (py_ecc-style affine form)."""
    x1, y1 = P1
    x2, y2 = P2
    xt, yt = T
    if x1 != x2:
        m = (y2 - y1) * (x2 - x1).inv()
        return m * (xt - x1) - (yt - y1)
    elif y1 == y2:
        m = (3 * x1.square()) * (2 * y1).inv()
        return m * (xt - x1) - (yt - y1)
    else:
        return xt - x1


# -- casts ------------------------------------------------------------------


def cast_g1(P):
    """G1 affine (x, y) python ints -> E(Fq12)."""
    if P is None:
        return None
    return (Fq12([P[0]]), Fq12([P[1]]))


def twist_g2(P):
    """G2 affine ((x0,x1),(y0,y1)) over Fq2 -> E(Fq12).

    u |-> w^6 - 1, then (x, y) |-> (x w^2, y w^3) lands on y^2 = x^3 + 4.
    """
    if P is None:
        return None
    (x0, x1), (y0, y1) = P
    # a + b u  =  (a - b) + b w^6
    nx = [0] * DEG
    nx[0], nx[6] = (x0 - x1) % Q, x1
    ny = [0] * DEG
    ny[0], ny[6] = (y0 - y1) % Q, y1
    # untwist: (x, y) -> (x / w^2, y / w^3) lands on y^2 = x^3 + 4 since
    # y^2 = x^3 + 4(u+1) and u+1 = w^6.
    w2i = Fq12([0, 0, 1]).inv()
    w3i = Fq12([0, 0, 0, 1]).inv()
    return (Fq12(nx) * w2i, Fq12(ny) * w3i)


# -- Miller loop + final exponentiation -------------------------------------

ATE_LOOP_COUNT = -BLS_X  # 0xd201000000010000 (positive magnitude)


def miller_loop(Q2, P1):
    """f_{x,Q}(P) for twisted Q2 and cast P1 (no final exponentiation)."""
    if Q2 is None or P1 is None:
        return Fq12.one()
    Rp = Q2
    f = Fq12.one()
    for b in bin(ATE_LOOP_COUNT)[3:]:
        f = f * f * _linefunc(Rp, Rp, P1)
        Rp = _ec_double(Rp)
        if b == "1":
            f = f * _linefunc(Rp, Q2, P1)
            Rp = _ec_add(Rp, Q2)
    return f


@functools.lru_cache(maxsize=1)
def _frob_w_powers():
    """Powers (w^q)^i for the Frobenius endomorphism, computed once."""
    wq = Fq12([0, 1]).pow(Q)
    out = [Fq12.one()]
    for _ in range(DEG - 1):
        out.append(out[-1] * wq)
    return out


def frobenius(f: Fq12) -> Fq12:
    """f^q via coefficient-wise map (c_i in Fq are Frobenius-fixed)."""
    pw = _frob_w_powers()
    acc = Fq12.zero()
    for i, c in enumerate(f.c):
        if c:
            acc = acc + pw[i] * c
    return acc


def final_exponentiation(f: Fq12) -> Fq12:
    """f^((q^12 - 1)/r): easy part by Frobenius, hard part by plain pow."""
    # easy: f^(q^6 - 1) then ^(q^2 + 1)
    f6 = f
    for _ in range(6):
        f6 = frobenius(f6)
    f = f6 * f.inv()
    f2 = frobenius(frobenius(f))
    f = f2 * f
    # hard: ^((q^4 - q^2 + 1) / r)
    hard = (Q**4 - Q**2 + 1) // R
    return f.pow(hard)


def pairing(P1, Q2) -> Fq12:
    """e(P, Q) for G1 affine int P and G2 affine int-pair Q."""
    return final_exponentiation(miller_loop(twist_g2(Q2), cast_g1(P1)))


def pairing_product(pairs) -> Fq12:
    """prod e(P_i, Q_i) with a single final exponentiation — the shape of
    the Groth16 verifier check (verifier.rs:59-65, mod.rs:40,104)."""
    f = Fq12.one()
    for P1, Q2 in pairs:
        f = f * miller_loop(twist_g2(Q2), cast_g1(P1))
    return final_exponentiation(f)
