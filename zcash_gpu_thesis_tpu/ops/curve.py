"""Batched BLS12-381 G1/G2 group operations — complete projective formulas.

TPU-native re-design of the reference's curve layer
(``pairing/src/bls12_381/ec.rs`` Jacobian ``curve_impl!`` and its OpenCL
port ``bellman/src/bls12-381.cl:889-1160``).  The reference's Jacobian
add/double branch on every special case (infinity, equal points,
negatives); vector lanes cannot branch per element, and masking a Jacobian
add against a doubling fallback would nearly double the cost.  Instead we
use the *complete* homogeneous-projective formulas of Renes–Costello–Batina
(EUROCRYPT 2016) specialized to a = 0: one straight-line code path that is
correct for every input pair, including identities, doublings and inverse
pairs.  Identity is (0 : 1 : 0).

Points are pytrees ``(X, Y, Z)`` of field elements (for G2 each coordinate
is an Fq2 pair), batch-first with arbitrary leading dims.  Affine points
are ``(x, y, inf)`` with an explicit infinity mask, the analogue of the
reference's ``Affine{x, y, infinity}`` struct (bls12-381.cl:1067).

Field access goes through a tiny adapter (`G1`, `G2`) so every formula is
written once and instantiated for both groups.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import (B_COEFF, G1_GEN_X, G1_GEN_Y, G2_GEN_X_C0,
                         G2_GEN_X_C1, G2_GEN_Y_C0, G2_GEN_Y_C1)
from . import field as F
from . import fq2


class _G1Field:
    """Fq adapter for the generic group formulas."""

    name = "g1"
    spec = F.FQ

    @staticmethod
    def mul(a, b):
        return F.mont_mul(F.FQ, a, b)

    @staticmethod
    def square(a):
        return F.mont_square(F.FQ, a)

    @staticmethod
    def add(a, b):
        return F.add(F.FQ, a, b)

    @staticmethod
    def sub(a, b):
        return F.sub(F.FQ, a, b)

    @staticmethod
    def neg(a):
        return F.neg(F.FQ, a)

    @staticmethod
    def double(a):
        return F.double(F.FQ, a)

    @staticmethod
    def mul_b3(a):
        # b = 4 (y^2 = x^3 + 4, constants.py B_COEFF), so b3 = 12.
        return F.mul_small(F.FQ, a, 3 * B_COEFF)

    @staticmethod
    def zeros(shape=()):
        return F.zeros(F.FQ, shape)

    @staticmethod
    def one(shape=()):
        return F.one_mont(F.FQ, shape)

    @staticmethod
    def select(mask, a, b):
        return F.select(mask, a, b)

    @staticmethod
    def is_zero(a):
        return F.is_zero(F.FQ, a)

    @staticmethod
    def eq(a, b):
        return F.eq(F.FQ, a, b)

    @staticmethod
    def inv(a):
        return F.inv(F.FQ, a)

    @staticmethod
    def batch_shape(a):
        return a.shape[:-1]


class _G2Field:
    """Fq2 adapter: coordinates are (c0, c1) pairs."""

    name = "g2"
    spec = F.FQ

    mul = staticmethod(fq2.mul)
    square = staticmethod(fq2.square)
    add = staticmethod(fq2.add)
    sub = staticmethod(fq2.sub)
    neg = staticmethod(fq2.neg)
    double = staticmethod(fq2.double)
    zeros = staticmethod(fq2.zeros)
    one = staticmethod(fq2.one_mont)
    select = staticmethod(fq2.select)
    is_zero = staticmethod(fq2.is_zero)
    eq = staticmethod(fq2.eq)
    inv = staticmethod(fq2.inv)

    @staticmethod
    def mul_b3(a):
        # Twist: y^2 = x^3 + 4(u+1)  =>  b3 = 12(u+1).
        return fq2.mul_small_nonresidue(a, 3 * B_COEFF)

    @staticmethod
    def batch_shape(a):
        return a[0].shape[:-1]


class Group:
    """A short-Weierstrass group (a=0) over a field adapter."""

    def __init__(self, fld, gen_affine_ints):
        self.f = fld
        self._gen_ints = gen_affine_ints

    # -- constructors -------------------------------------------------------

    def identity(self, shape=()):
        """(0 : 1 : 0), batched."""
        f = self.f
        return (f.zeros(shape), f.one(shape), f.zeros(shape))

    def generator(self, shape=()):
        x, y = self._gen_ints
        if self.f is G1F:
            gx = F.mont_const(F.FQ, x, shape)
            gy = F.mont_const(F.FQ, y, shape)
        else:
            gx = fq2.const(x[0], x[1], shape)
            gy = fq2.const(y[0], y[1], shape)
        inf = jnp.zeros(shape, dtype=bool)
        return (gx, gy, inf)  # affine

    def from_affine(self, aff):
        """Affine (x, y, inf) -> projective; infinity maps to (0:1:0)."""
        x, y, inf = aff
        f = self.f
        shape = f.batch_shape(x)
        one = f.one(shape)
        zero = f.zeros(shape)
        return (
            f.select(inf, zero, x),
            f.select(inf, one, y),
            f.select(inf, zero, one),
        )

    # -- complete group law (Renes–Costello–Batina, a = 0) ------------------

    def add(self, p, q):
        """Complete projective addition (RCB Algorithm 7, a=0, 12M+2mb3)."""
        f = self.f
        x1, y1, z1 = p
        x2, y2, z2 = q
        t0 = f.mul(x1, x2)
        t1 = f.mul(y1, y2)
        t2 = f.mul(z1, z2)
        t3 = f.mul(f.add(x1, y1), f.add(x2, y2))
        t3 = f.sub(t3, f.add(t0, t1))            # x1y2 + x2y1
        t4 = f.mul(f.add(y1, z1), f.add(y2, z2))
        t4 = f.sub(t4, f.add(t1, t2))            # y1z2 + y2z1
        x3 = f.mul(f.add(x1, z1), f.add(x2, z2))
        y3 = f.sub(x3, f.add(t0, t2))            # x1z2 + x2z1
        t0 = f.add(f.double(t0), t0)             # 3 x1x2
        t2 = f.mul_b3(t2)                        # b3 z1z2
        z3 = f.add(t1, t2)
        t1 = f.sub(t1, t2)                       # y1y2 -/+ b3 z1z2
        y3 = f.mul_b3(y3)
        x3 = f.sub(f.mul(t3, t1), f.mul(t4, y3))
        y3 = f.add(f.mul(t1, z3), f.mul(y3, t0))
        z3 = f.add(f.mul(z3, t4), f.mul(t0, t3))
        return (x3, y3, z3)

    def add_mixed(self, p, aff):
        """Complete mixed addition (RCB Algorithm 8, a=0, 11M+2mb3).

        `aff` is (x2, y2, inf); the infinity case is handled by a select
        (the formula itself assumes z2 = 1).
        """
        f = self.f
        x1, y1, z1 = p
        x2, y2, inf = aff
        t0 = f.mul(x1, x2)
        t1 = f.mul(y1, y2)
        t3 = f.mul(f.add(x2, y2), f.add(x1, y1))
        t3 = f.sub(t3, f.add(t0, t1))            # x1y2 + x2y1
        t4 = f.add(f.mul(y2, z1), y1)            # y1 + y2z1
        y3 = f.add(f.mul(x2, z1), x1)            # x1 + x2z1
        t0 = f.add(f.double(t0), t0)             # 3 x1x2
        t2 = f.mul_b3(z1)                        # b3 z1
        z3 = f.add(t1, t2)
        t1 = f.sub(t1, t2)
        y3 = f.mul_b3(y3)
        x3 = f.sub(f.mul(t3, t1), f.mul(t4, y3))
        y3 = f.add(f.mul(t1, z3), f.mul(y3, t0))
        z3 = f.add(f.mul(z3, t4), f.mul(t0, t3))
        out = (x3, y3, z3)
        return tuple(f.select(inf, a, b) for a, b in zip(p, out))

    def double(self, p):
        """Complete doubling (RCB Algorithm 9, a=0, 6M+2S+1mb3)."""
        f = self.f
        x, y, z = p
        t0 = f.square(y)
        z3 = f.double(f.double(f.double(t0)))    # 8 y^2
        t1 = f.mul(y, z)
        t2 = f.mul_b3(f.square(z))               # b3 z^2
        x3 = f.mul(t2, z3)
        y3 = f.add(t0, t2)
        z3 = f.mul(t1, z3)
        t2 = f.add(f.double(t2), t2)             # 3 b3 z^2
        t0 = f.sub(t0, t2)
        y3 = f.add(f.mul(t0, y3), x3)
        x3 = f.double(f.mul(t0, f.mul(x, y)))
        return (x3, y3, z3)

    def neg(self, p):
        x, y, z = p
        return (x, self.f.neg(y), z)

    def select(self, mask, p, q):
        return tuple(self.f.select(mask, a, b) for a, b in zip(p, q))

    # -- boundary ops -------------------------------------------------------

    def is_identity(self, p):
        return self.f.is_zero(p[2])

    def to_affine(self, p):
        """Projective -> affine (x, y, inf).  Batched Fermat inverse."""
        f = self.f
        x, y, z = p
        inf = f.is_zero(z)
        zinv = f.inv(z)  # inv(0) = 0 -> coords 0 at infinity
        return (f.mul(x, zinv), f.mul(y, zinv), inf)

    def eq(self, p, q):
        """Projective equality: x1 z2 == x2 z1 and y1 z2 == y2 z1 (+inf)."""
        f = self.f
        x1, y1, z1 = p
        x2, y2, z2 = q
        i1, i2 = f.is_zero(z1), f.is_zero(z2)
        same = jnp.logical_and(
            f.eq(f.mul(x1, z2), f.mul(x2, z1)),
            f.eq(f.mul(y1, z2), f.mul(y2, z1)),
        )
        both_inf = jnp.logical_and(i1, i2)
        one_inf = jnp.logical_xor(i1, i2)
        return jnp.logical_and(
            jnp.logical_or(same, both_inf), jnp.logical_not(one_inf)
        )

    def on_curve(self, aff):
        """y^2 == x^3 + b for affine points (or infinity)."""
        f = self.f
        x, y, inf = aff
        y2 = f.square(y)
        x3b = f.mul(f.square(x), x)
        if self.f is G1F:
            b = F.mont_const(F.FQ, B_COEFF, f.batch_shape(x))
        else:
            b = fq2.const(B_COEFF, B_COEFF, f.batch_shape(x[0]))
        x3b = f.add(x3b, b)
        return jnp.logical_or(f.eq(y2, x3b), inf)

    def scalar_mul(self, p, bits):
        """Double-and-add over a static-length bit array [nbits] (MSB
        first), batched over p.  For tests and one-off host use; bulk
        scalar multiplication goes through the MSM kernels."""
        import jax

        def body(acc, bit):
            acc = self.double(acc)
            withadd = self.add(acc, p)
            acc = self.select(bit != 0, withadd, acc)
            return acc, None

        shape = self.f.batch_shape(p[0])
        acc, _ = jax.lax.scan(body, self.identity(shape), bits)
        return acc


G1F = _G1Field()
G2F = _G2Field()
G1 = Group(G1F, (G1_GEN_X, G1_GEN_Y))
G2 = Group(G2F, ((G2_GEN_X_C0, G2_GEN_X_C1), (G2_GEN_Y_C0, G2_GEN_Y_C1)))


# ---------------------------------------------------------------------------
# Host conversions (tests / fixtures).
# ---------------------------------------------------------------------------


def g1_affine_from_ints(points) -> tuple:
    """List of (x, y) python-int pairs or None -> batched affine pytree."""
    import numpy as np

    xs = [0 if p is None else p[0] for p in points]
    ys = [0 if p is None else p[1] for p in points]
    inf = np.asarray([p is None for p in points])
    return (
        jnp.asarray(F.batch_to_limbs(F.FQ, xs)),
        jnp.asarray(F.batch_to_limbs(F.FQ, ys)),
        jnp.asarray(inf),
    )


def g2_affine_from_ints(points) -> tuple:
    import numpy as np

    def c(i, j):
        return [0 if p is None else p[i][j] for p in points]

    inf = np.asarray([p is None for p in points])
    x = (
        jnp.asarray(F.batch_to_limbs(F.FQ, c(0, 0))),
        jnp.asarray(F.batch_to_limbs(F.FQ, c(0, 1))),
    )
    y = (
        jnp.asarray(F.batch_to_limbs(F.FQ, c(1, 0))),
        jnp.asarray(F.batch_to_limbs(F.FQ, c(1, 1))),
    )
    return (x, y, jnp.asarray(inf))


def g1_affine_to_ints(aff) -> list:
    """Batched affine pytree -> list of (x, y) pairs / None."""
    import numpy as np

    x = F.batch_from_limbs(F.FQ, aff[0])
    y = F.batch_from_limbs(F.FQ, aff[1])
    inf = np.asarray(aff[2]).reshape(-1)
    return [None if i else (a, b) for a, b, i in zip(x, y, inf)]


def g2_affine_to_ints(aff) -> list:
    import numpy as np

    x0 = F.batch_from_limbs(F.FQ, aff[0][0])
    x1 = F.batch_from_limbs(F.FQ, aff[0][1])
    y0 = F.batch_from_limbs(F.FQ, aff[1][0])
    y1 = F.batch_from_limbs(F.FQ, aff[1][1])
    inf = np.asarray(aff[2]).reshape(-1)
    return [
        None if i else ((a0, a1), (b0, b1))
        for a0, a1, b0, b1, i in zip(x0, x1, y0, y1, inf)
    ]
