"""Differential tests: TPU limb field kernels vs python-int oracle.

The reference's central testing idea (SURVEY.md §4 tier 2): every device
kernel is bit-exact-checked element-by-element against the host reference
(pattern of `pairing/src/lib.rs:773+` test_ocl_* / fq.rs:2962+).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zcash_gpu_thesis_tpu.ops import field as F
from zcash_gpu_thesis_tpu.oracle.field import FQ_ORACLE, FR_ORACLE
from zcash_gpu_thesis_tpu.utils.limbs import ints_to_limbs, limbs_to_ints

SPECS = {"fq": (F.FQ, FQ_ORACLE), "fr": (F.FR, FR_ORACLE)}
N = 64


def _rand_elems(rng, spec, n):
    return [rng.randrange(spec.modulus) for _ in range(n)]


def _limbs(spec, xs):
    return jnp.asarray(ints_to_limbs(xs, spec.n_limbs))


@pytest.mark.parametrize("name", SPECS)
def test_roundtrip(rng, name):
    spec, _ = SPECS[name]
    xs = _rand_elems(rng, spec, N) + [0, 1, spec.modulus - 1]
    a = _limbs(spec, xs)
    assert limbs_to_ints(a) == xs


@pytest.mark.parametrize("name", SPECS)
@pytest.mark.parametrize("op", ["add", "sub", "mul"])
def test_binary_ops(rng, name, op):
    spec, oracle = SPECS[name]
    xs = _rand_elems(rng, spec, N) + [0, 0, spec.modulus - 1, spec.modulus - 1]
    ys = _rand_elems(rng, spec, N) + [0, spec.modulus - 1, 0, spec.modulus - 1]
    a, b = _limbs(spec, xs), _limbs(spec, ys)
    fn = {"add": F.add, "sub": F.sub, "mul": F.mont_mul}[op]
    got = limbs_to_ints(jax.jit(lambda a, b: fn(spec, a, b))(a, b))
    ofn = {"add": oracle.add, "sub": oracle.sub, "mul": oracle.mul}[op]
    want = [ofn(x, y) for x, y in zip(xs, ys)]
    assert got == want


@pytest.mark.parametrize("name", SPECS)
def test_unary_ops(rng, name):
    spec, oracle = SPECS[name]
    xs = _rand_elems(rng, spec, N) + [0, 1, spec.modulus - 1]
    a = _limbs(spec, xs)
    assert limbs_to_ints(F.mont_square(spec, a)) == [oracle.square(x) for x in xs]
    assert limbs_to_ints(F.neg(spec, a)) == [oracle.neg(x) for x in xs]
    assert limbs_to_ints(F.double(spec, a)) == [oracle.add(x, x) for x in xs]


@pytest.mark.parametrize("name", SPECS)
def test_mont_roundtrip(rng, name):
    spec, _ = SPECS[name]
    xs = _rand_elems(rng, spec, N)
    a = _limbs(spec, xs)
    m = F.to_mont(spec, a)
    assert limbs_to_ints(m) == [spec.to_mont_int(x) for x in xs]
    back = F.from_mont(spec, m)
    assert limbs_to_ints(back) == xs


@pytest.mark.parametrize("name", SPECS)
def test_inverse(rng, name):
    spec, oracle = SPECS[name]
    xs = _rand_elems(rng, spec, 16)
    a = _limbs(spec, xs)  # treat as Montgomery-form values
    ainv = jax.jit(lambda a: F.inv(spec, a))(a)
    one = F.mont_mul(spec, a, ainv)
    assert limbs_to_ints(one) == [spec.r] * len(xs)
    assert limbs_to_ints(ainv) == [oracle.inv(x) for x in xs]


@pytest.mark.parametrize("name", SPECS)
def test_pow_const(rng, name):
    spec, oracle = SPECS[name]
    xs = _rand_elems(rng, spec, 8)
    a = _limbs(spec, xs)
    for e in [0, 1, 2, 3, 65537, spec.modulus - 2]:
        got = limbs_to_ints(F.pow_const(spec, a, e))
        want = [oracle.pow(x, e) for x in xs]
        assert got == want, f"e={e}"


@pytest.mark.parametrize("name", SPECS)
def test_predicates(rng, name):
    spec, _ = SPECS[name]
    xs = [0, 1, 5, spec.modulus - 1]
    a = _limbs(spec, xs)
    assert list(np.asarray(F.is_zero(spec, a))) == [True, False, False, False]
    assert bool(np.asarray(F.eq(spec, a[1], a[1])))
    assert not bool(np.asarray(F.eq(spec, a[1], a[2])))
