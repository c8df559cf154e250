"""Differential curve tests: batched complete-formula G1/G2 vs python oracle.

Mirrors the reference's GPU curve tests (`ec.rs:1275+` test_ocl_* — random
inputs through the device kernel, element-wise equality against the host
implementation), plus the special cases the complete formulas must cover
without branches: identity, doubling via add, inverse pairs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zcash_gpu_thesis_tpu.ops import curve as C
from zcash_gpu_thesis_tpu.oracle import curve as O

GROUPS = {
    "g1": (C.G1, O.g1_add, O.g1_mul, O.G1_GEN,
           C.g1_affine_from_ints, C.g1_affine_to_ints, O.random_g1_points),
    "g2": (C.G2, O.g2_add, O.g2_mul, O.G2_GEN,
           C.g2_affine_from_ints, C.g2_affine_to_ints, O.random_g2_points),
}


def _neg(P, g):
    if P is None:
        return None
    if g == "g1":
        return (P[0], (-P[1]) % O.Q)
    return (P[0], tuple((-c) % O.Q for c in P[1]))


@pytest.fixture(params=list(GROUPS), scope="module")
def group(request):
    return request.param


@pytest.fixture(scope="module")
def pts(group):
    import random

    rng = random.Random(0xC0FFEE + hash(group) % 1000)
    n = 6 if group == "g2" else 10
    _, _, _, _, _, _, randpts = GROUPS[group]
    return randpts(rng, n)


def test_add_and_double(group, pts):
    G, oadd, _, _, from_ints, to_ints, _ = GROUPS[group]
    # pairs: random x random, P+P (doubling), P + (-P), P + inf, inf + inf
    lhs = pts + [pts[0], pts[1], pts[2], None]
    rhs = pts[1:] + pts[:1] + [pts[0], _neg(pts[1], group), None, None]
    want = [oadd(a, b) for a, b in zip(lhs, rhs)]

    pa = G.from_affine(from_ints(lhs))
    pb = G.from_affine(from_ints(rhs))
    got = to_ints(jax.jit(lambda a, b: G.to_affine(G.add(a, b)))(pa, pb))
    assert got == want

    # doubling kernel against oracle adds
    got_dbl = to_ints(jax.jit(lambda a: G.to_affine(G.double(a)))(pa))
    want_dbl = [oadd(a, a) for a in lhs]
    assert got_dbl == want_dbl


def test_add_mixed(group, pts):
    G, oadd, _, _, from_ints, to_ints, _ = GROUPS[group]
    lhs = pts + [pts[0], pts[1], pts[2], None]
    rhs = pts[1:] + pts[:1] + [pts[0], _neg(pts[1], group), None, None]
    want = [oadd(a, b) for a, b in zip(lhs, rhs)]

    pa = G.from_affine(from_ints(lhs))
    aff = from_ints(rhs)
    got = to_ints(jax.jit(lambda a, b: G.to_affine(G.add_mixed(a, b)))(pa, aff))
    assert got == want


def test_scalar_mul(group, pts):
    G, _, omul, gen, from_ints, to_ints, _ = GROUPS[group]
    scalars = [0, 1, 2, 3, 7, 0x12345]
    nbits = 17 * 4 + 1
    p = G.from_affine(from_ints([pts[0]]))
    fn = jax.jit(lambda p, bits: G.to_affine(G.scalar_mul(p, bits)))
    for k in scalars:
        bits = jnp.asarray(
            [(k >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.int32
        )
        got = to_ints(fn(p, bits))
        assert got == [omul(pts[0], k)], f"k={k}"


def test_scalar_mul_full_width(group, pts):
    if group == "g2":
        pytest.skip("g1-only: g2 exercised by the short scalar_mul test")
    G, _, omul, _, from_ints, to_ints, _ = GROUPS[group]
    k = 0x73EDA753299D7D48_3339D80809A1D805_53BDA402FFFE5BFE % O.R
    bits = jnp.asarray([(k >> (254 - i)) & 1 for i in range(255)], dtype=jnp.int32)
    p = G.from_affine(from_ints(pts[:2]))
    out = jax.jit(lambda p: G.scalar_mul(p, bits))(p)
    got = to_ints(G.to_affine(out))
    assert got == [omul(q, k) for q in pts[:2]]


def test_on_curve_and_eq(group, pts):
    G, _, _, gen, from_ints, _, _ = GROUPS[group]
    aff = from_ints(pts + [None])
    assert np.asarray(jax.jit(G.on_curve)(aff)).all()
    p = G.from_affine(aff)
    assert np.asarray(jax.jit(G.eq)(p, p)).all()
    # generator is on curve
    assert np.asarray(G.on_curve(G.generator())).all()
    # distinct points differ
    q = G.from_affine(from_ints(pts[1:] + pts[:1] + [None]))
    same = np.asarray(jax.jit(G.eq)(p, q))
    assert not same[:-1].any()
    assert same[-1]  # inf == inf


def test_identity_laws(group, pts):
    G, _, _, _, from_ints, to_ints, _ = GROUPS[group]
    p = G.from_affine(from_ints(pts))
    ident = G.identity((len(pts),))
    eq_add = jax.jit(lambda a, b, c: G.eq(G.add(a, b), c))
    assert np.asarray(eq_add(p, ident, p)).all()
    assert np.asarray(eq_add(ident, p, p)).all()
    isid = jax.jit(lambda a, b: G.is_identity(G.add(a, b)))
    assert np.asarray(isid(p, G.neg(p))).all()
    assert np.asarray(G.is_identity(G.double(ident))).all()
