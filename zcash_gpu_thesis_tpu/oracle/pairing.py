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


def pairing_slow(P1, Q2) -> Fq12:
    """e(P, Q) via the didactic affine Miller loop + plain-pow final
    exponentiation.  Kept as the cross-check oracle for the fast path."""
    return final_exponentiation(miller_loop(twist_g2(Q2), cast_g1(P1)))


# ---------------------------------------------------------------------------
# Fast production path: tower representation, prepared-G2 Miller loop with
# sparse line multiplication, and the y-chain final exponentiation.
#
# Same structure as the reference (G2Prepared coefficient stream +
# mul_by_014, bls12_381/mod.rs:40-102,163-330; Jacobian doubling/addition
# steps are Algorithms 26/27 of eprint 2010/354).  ~50-100x faster than the
# didactic path above; both compute the same e(P, Q) (tested equal).
# ---------------------------------------------------------------------------

from . import tower as T


def _prep_doubling_step(r):
    """Alg. 26 (eprint 2010/354): Jacobian double of r over Fq2, returning
    the line coefficients (ell_vw, ell_v?, ell_0) as the reference orders
    them — (tmp0, tmp3, tmp6) with ell = tmp6 + tmp3*x_P*v + tmp0*y_P*vw."""
    x, y, z = r
    tmp0 = T.f2_sq(x)
    tmp1 = T.f2_sq(y)
    tmp2 = T.f2_sq(tmp1)
    tmp3 = T.f2_sq(T.f2_add(tmp1, x))
    tmp3 = T.f2_sub(T.f2_sub(tmp3, tmp0), tmp2)
    tmp3 = T.f2_add(tmp3, tmp3)
    tmp4 = T.f2_add(T.f2_add(tmp0, tmp0), tmp0)
    tmp6 = T.f2_add(x, tmp4)
    tmp5 = T.f2_sq(tmp4)
    zsq = T.f2_sq(z)
    nx = T.f2_sub(T.f2_sub(tmp5, tmp3), tmp3)
    nz = T.f2_sub(T.f2_sub(T.f2_sq(T.f2_add(z, y)), tmp1), zsq)
    ny = T.f2_mul(T.f2_sub(tmp3, nx), tmp4)
    t2_8 = T.f2_add(tmp2, tmp2)
    t2_8 = T.f2_add(t2_8, t2_8)
    t2_8 = T.f2_add(t2_8, t2_8)
    ny = T.f2_sub(ny, t2_8)
    tmp3 = T.f2_mul(tmp4, zsq)
    tmp3 = T.f2_add(tmp3, tmp3)
    tmp3 = T.f2_neg(tmp3)
    tmp6 = T.f2_sub(T.f2_sub(T.f2_sq(tmp6), tmp0), tmp5)
    t1_4 = T.f2_add(tmp1, tmp1)
    t1_4 = T.f2_add(t1_4, t1_4)
    tmp6 = T.f2_sub(tmp6, t1_4)
    tmp0 = T.f2_mul(nz, zsq)
    tmp0 = T.f2_add(tmp0, tmp0)
    return (nx, ny, nz), (tmp0, tmp3, tmp6)


def _prep_addition_step(r, q):
    """Alg. 27 (eprint 2010/354): mixed Jacobian add r += q over Fq2."""
    rx, ry, rz = r
    qx, qy = q
    zsq = T.f2_sq(rz)
    ysq = T.f2_sq(qy)
    t0 = T.f2_mul(zsq, qx)
    t1 = T.f2_sub(T.f2_sub(T.f2_sq(T.f2_add(qy, rz)), ysq), zsq)
    t1 = T.f2_mul(t1, zsq)
    t2 = T.f2_sub(t0, rx)
    t3 = T.f2_sq(t2)
    t4 = T.f2_add(t3, t3)
    t4 = T.f2_add(t4, t4)
    t5 = T.f2_mul(t4, t2)
    t6 = T.f2_sub(T.f2_sub(t1, ry), ry)
    t9 = T.f2_mul(t6, qx)
    t7 = T.f2_mul(t4, rx)
    nx = T.f2_sub(T.f2_sub(T.f2_sub(T.f2_sq(t6), t5), t7), t7)
    nz = T.f2_sub(T.f2_sub(T.f2_sq(T.f2_add(rz, t2)), zsq), t3)
    t10 = T.f2_add(qy, nz)
    t8 = T.f2_mul(T.f2_sub(t7, nx), t6)
    t0 = T.f2_mul(ry, t5)
    t0 = T.f2_add(t0, t0)
    ny = T.f2_sub(t8, t0)
    t10 = T.f2_sub(T.f2_sq(t10), ysq)
    t10 = T.f2_sub(t10, T.f2_sq(nz))
    t9 = T.f2_sub(T.f2_add(t9, t9), t10)
    t10 = T.f2_add(nz, nz)
    t6 = T.f2_neg(t6)
    t1 = T.f2_add(t6, t6)
    return (nx, ny, nz), (t10, t1, t9)


def prepare_g2(Q2):
    """G2 affine int-pairs -> line coefficient stream (G2Prepared,
    ec.rs-equivalent mod.rs:163-330)."""
    if Q2 is None:
        return None
    r = (Q2[0], Q2[1], T.F2_ONE)
    coeffs = []
    seen_top = False
    for bit in bin(ATE_LOOP_COUNT >> 1)[2:]:
        if not seen_top:
            seen_top = True  # skip the leading one
            continue
        r, co = _prep_doubling_step(r)
        coeffs.append(co)
        if bit == "1":
            r, co = _prep_addition_step(r, Q2)
            coeffs.append(co)
    r, co = _prep_doubling_step(r)
    coeffs.append(co)
    return coeffs


def _f12_mul_by_014(f, c0, c1, c4):
    """Sparse f * (c0 + c1 v + c4 v w) (fq12.rs mul_by_014)."""
    a0, a1 = f
    # aa = a0 * (c0 + c1 v) over Fq6 (sparse: c2 = 0)
    x0, x1, x2 = a0
    aa = (
        T.f2_add(T.f2_mul(x0, c0), T.f2_mul_by_nonresidue(T.f2_mul(x2, c1))),
        T.f2_add(T.f2_mul(x1, c0), T.f2_mul(x0, c1)),
        T.f2_add(T.f2_mul(x2, c0), T.f2_mul(x1, c1)),
    )
    # bb = a1 * (c4 v) over Fq6 (sparse: only c1-slot)
    y0, y1, y2 = a1
    bb = (
        T.f2_mul_by_nonresidue(T.f2_mul(y2, c4)),
        T.f2_mul(y0, c4),
        T.f2_mul(y1, c4),
    )
    o = T.f2_add(c1, c4)
    # c1_out = (a0 + a1)(c0 + o v) - aa - bb
    s0, s1, s2 = (T.f2_add(x0, y0), T.f2_add(x1, y1), T.f2_add(x2, y2))
    t = (
        T.f2_add(T.f2_mul(s0, c0), T.f2_mul_by_nonresidue(T.f2_mul(s2, o))),
        T.f2_add(T.f2_mul(s1, c0), T.f2_mul(s0, o)),
        T.f2_add(T.f2_mul(s2, c0), T.f2_mul(s1, o)),
    )
    c1_out = T.f6_sub(T.f6_sub(t, aa), bb)
    c0_out = T.f6_add(T.f6_mul_by_nonresidue(bb), aa)
    return (c0_out, c1_out)


def miller_loop_prepared(pairs):
    """prod_i f_{x, Q_i}(P_i) over prepared pairs [(P_affine, coeffs)]
    (mod.rs:40-102): shared squarings, sparse line multiplications."""
    live = [(p, iter(cs)) for p, cs in pairs if p is not None and cs]
    f = T.F12_ONE

    def ell(f, cs, p):
        c0, c1, c4 = next(cs)
        px, py = p
        return _f12_mul_by_014(
            f,
            c4,
            (c1[0] * px % Q, c1[1] * px % Q),
            (c0[0] * py % Q, c0[1] * py % Q),
        )

    seen_top = False
    for bit in bin(ATE_LOOP_COUNT >> 1)[2:]:
        if not seen_top:
            seen_top = True
            continue
        for p, cs in live:
            f = ell(f, cs, p)
        if bit == "1":
            for p, cs in live:
                f = ell(f, cs, p)
        f = T.f12_sq(f)
    for p, cs in live:
        f = ell(f, cs, p)
    return T.f12_conjugate(f)  # BLS_X is negative


def _exp_by_x(f):
    """f^BLS_X (x negative: |x|-pow then conjugate)."""
    acc = T.F12_ONE
    base = f
    e = ATE_LOOP_COUNT
    while e:
        if e & 1:
            acc = T.f12_mul(acc, base)
        e >>= 1
        if e:
            base = T.f12_sq(base)
    return T.f12_conjugate(acc)


def _exp_by_half_x(f):
    acc = T.F12_ONE
    base = f
    e = ATE_LOOP_COUNT >> 1
    while e:
        if e & 1:
            acc = T.f12_mul(acc, base)
        e >>= 1
        if e:
            base = T.f12_sq(base)
    return T.f12_conjugate(acc)


def final_exponentiation_fast(f):
    """f^((q^12-1)/r), tower form — the reference's chain
    (mod.rs:104-160): easy part by Frobenius/inverse, hard part by the
    y0..y3 addition chain in x."""
    f1 = T.f12_conjugate(f)
    f2 = T.f12_inv(f)
    r = T.f12_mul(f1, f2)          # f^(q^6 - 1)
    f2 = r
    r = T.f12_frobenius(r, 2)
    r = T.f12_mul(r, f2)           # ^(q^2 + 1) — easy part done
    y0 = T.f12_sq(r)
    y1 = _exp_by_x(y0)
    y2 = _exp_by_half_x(y1)
    y3 = T.f12_conjugate(r)
    y1 = T.f12_mul(y1, y3)
    y1 = T.f12_conjugate(y1)
    y1 = T.f12_mul(y1, y2)
    y2 = _exp_by_x(y1)
    y3 = _exp_by_x(y2)
    y1 = T.f12_conjugate(y1)
    y3 = T.f12_mul(y3, y1)
    y1 = T.f12_conjugate(y1)
    y1 = T.f12_frobenius(y1, 3)
    y2 = T.f12_frobenius(y2, 2)
    y1 = T.f12_mul(y1, y2)
    y2 = _exp_by_x(y3)
    y2 = T.f12_mul(y2, y0)
    y2 = T.f12_mul(y2, r)
    y1 = T.f12_mul(y1, y2)
    y2 = T.f12_frobenius(y3, 1)
    y1 = T.f12_mul(y1, y2)
    return y1


def pairing(P1, Q2) -> Fq12:
    """e(P, Q) for G1 affine int P and G2 affine int-pair Q."""
    return pairing_product([(P1, Q2)])


def pairing_product(pairs) -> Fq12:
    """prod e(P_i, Q_i) with a single final exponentiation — the shape of
    the Groth16 verifier check (verifier.rs:59-65, mod.rs:40,104)."""
    prepped = [(P1, prepare_g2(Q2)) for P1, Q2 in pairs
               if P1 is not None and Q2 is not None]
    f = miller_loop_prepared(prepped)
    return T.to_single(final_exponentiation_fast(f))
