"""Vectorized Fq2 arithmetic (Fq[u]/(u^2+1)) on lazy 12-bit limb arrays.

TPU analogue of `pairing/src/bls12_381/fq2.rs`.  An Fq2 element is a pair of
Fq limb arrays ``(c0, c1)``, each ``[..., 33] int32`` in the lazy-reduced
representation of ``ops.field``.  Multiplication uses the 3-multiplication
Karatsuba form (same algebra as fq2.rs mul_assign).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import field as F

FQ = F.FQ


def zeros(shape=()):
    return (F.zeros(FQ, shape), F.zeros(FQ, shape))


def one_mont(shape=()):
    return (F.one_mont(FQ, shape), F.zeros(FQ, shape))


def const(c0: int, c1: int, shape=(), mont: bool = True):
    """Host (c0, c1) integers -> Fq2 limb constant (Montgomery by default)."""
    f = F.mont_const if mont else F.const
    return (f(FQ, c0, shape), f(FQ, c1, shape))


def is_zero(a):
    return jnp.logical_and(F.is_zero(FQ, a[0]), F.is_zero(FQ, a[1]))


def eq(a, b):
    return jnp.logical_and(F.eq(FQ, a[0], b[0]), F.eq(FQ, a[1], b[1]))


def add(a, b):
    return (F.add(FQ, a[0], b[0]), F.add(FQ, a[1], b[1]))


def sub(a, b):
    return (F.sub(FQ, a[0], b[0]), F.sub(FQ, a[1], b[1]))


def neg(a):
    return (F.neg(FQ, a[0]), F.neg(FQ, a[1]))


def double(a):
    return (F.double(FQ, a[0]), F.double(FQ, a[1]))


def mul_small(a, k: int):
    return (F.mul_small(FQ, a[0], k), F.mul_small(FQ, a[1], k))


def mul(a, b):
    """(a0 + a1 u)(b0 + b1 u) with u^2 = -1: 3 Fq multiplications."""
    a0, a1 = a
    b0, b1 = b
    t0 = F.mont_mul(FQ, a0, b0)
    t1 = F.mont_mul(FQ, a1, b1)
    t2 = F.mont_mul(FQ, F.add(FQ, a0, a1), F.add(FQ, b0, b1))
    c0 = F.sub(FQ, t0, t1)
    c1 = F.sub(FQ, F.sub(FQ, t2, t0), t1)
    return (c0, c1)


def square(a):
    """(a0 + a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u (fq2.rs square)."""
    a0, a1 = a
    s = F.add(FQ, a0, a1)
    d = F.sub(FQ, a0, a1)
    c0 = F.mont_mul(FQ, s, d)
    t = F.mont_mul(FQ, a0, a1)
    c1 = F.double(FQ, t)
    return (c0, c1)


def mul_by_nonresidue(a):
    """Multiply by (u + 1), the quadratic non-residue used to build Fq6
    (fq2.rs mul_by_nonresidue): (a0 + a1 u)(1 + u) = (a0 - a1) + (a0 + a1)u.
    """
    return (F.sub(FQ, a[0], a[1]), F.add(FQ, a[0], a[1]))


def mul_small_nonresidue(a, k: int):
    """k * (u+1) * a for small static k — e.g. b3 = 12(u+1) on the G2 twist."""
    return (
        F.mul_small(FQ, F.sub(FQ, a[0], a[1]), k),
        F.mul_small(FQ, F.add(FQ, a[0], a[1]), k),
    )


def mul_scalar_fq(a, k):
    """Multiply both components by an Fq limb element k (Montgomery)."""
    return (F.mont_mul(FQ, a[0], k), F.mont_mul(FQ, a[1], k))


def conjugate(a):
    return (a[0], F.neg(FQ, a[1]))


def inv(a):
    """1 / (a0 + a1 u) = (a0 - a1 u) / (a0^2 + a1^2)."""
    a0, a1 = a
    n = F.add(FQ, F.mont_square(FQ, a0), F.mont_square(FQ, a1))
    ninv = F.inv(FQ, n)
    return (F.mont_mul(FQ, a0, ninv), F.neg(FQ, F.mont_mul(FQ, a1, ninv)))


def select(mask, a, b):
    """Elementwise select: mask broadcast over limb axis."""
    m = mask[..., None]
    return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]))
