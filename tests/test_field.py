"""Differential tests: TPU limb field kernels vs python-int oracle.

The reference's central testing idea (SURVEY.md §4 tier 2): every device
kernel is bit-exact-checked element-by-element against the host reference
(pattern of `pairing/src/lib.rs:773+` test_ocl_* / fq.rs:2962+).

The TPU field layer is *lazily reduced* (values < 2B, redundant limbs), so
comparisons go through exact canonicalization — either the device-side
`canon` or the host-side value reduction — and every test also checks the
representation invariant (non-negative limbs <= 2^12+2, value < 2B).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zcash_gpu_thesis_tpu.constants import LIMB_BITS
from zcash_gpu_thesis_tpu.ops import field as F
from zcash_gpu_thesis_tpu.oracle.field import FQ_ORACLE, FR_ORACLE
from zcash_gpu_thesis_tpu.utils.limbs import ints_to_limbs, limbs_to_ints

SPECS = {"fq": (F.FQ, FQ_ORACLE), "fr": (F.FR, FR_ORACLE)}
N = 64


def _rand_elems(rng, spec, n):
    return [rng.randrange(spec.modulus) for _ in range(n)]


def _limbs(spec, xs):
    return jnp.asarray(ints_to_limbs(xs, spec.n_limbs))


def _check_invariant(spec, a):
    """Lazy-representation invariant: limbs in [0, 2^12+2], value < 2B."""
    a = np.asarray(a)
    assert a.min() >= 0, "negative limb"
    assert a.max() <= (1 << LIMB_BITS) + 2, f"limb overflow: {a.max()}"
    big = 2 << (LIMB_BITS * spec.fold)
    for v in limbs_to_ints(a):
        assert v < big, "value exceeds 2B"


def _values(spec, a):
    """Host-side exact residues of a lazy limb array."""
    return [v % spec.modulus for v in limbs_to_ints(np.asarray(a))]


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
    got = jax.jit(lambda a, b: fn(spec, a, b))(a, b)
    _check_invariant(spec, got)
    ofn = {"add": oracle.add, "sub": oracle.sub, "mul": oracle.mul}[op]
    want = [ofn(x, y) for x, y in zip(xs, ys)]
    assert _values(spec, got) == want
    # device-side canonicalization agrees
    assert limbs_to_ints(F.canon(spec, got)) == want


@pytest.mark.parametrize("name", SPECS)
def test_unary_ops(rng, name):
    spec, oracle = SPECS[name]
    xs = _rand_elems(rng, spec, N) + [0, 1, spec.modulus - 1]
    a = _limbs(spec, xs)
    assert _values(spec, F.mont_square(spec, a)) == [oracle.square(x) for x in xs]
    assert _values(spec, F.neg(spec, a)) == [oracle.neg(x) for x in xs]
    assert _values(spec, F.double(spec, a)) == [oracle.add(x, x) for x in xs]
    for k in [0, 1, 2, 3, 4, 12, 20]:
        got = F.mul_small(spec, a, k)
        _check_invariant(spec, got)
        assert _values(spec, got) == [x * k % spec.modulus for x in xs], k
    s3 = F.add3(spec, a, a, a)
    _check_invariant(spec, s3)
    assert _values(spec, s3) == [3 * x % spec.modulus for x in xs]


@pytest.mark.parametrize("name", SPECS)
def test_lazy_chain_stress(rng, name):
    """Random deep op chains keep the invariant and the right value."""
    spec, _ = SPECS[name]
    n = 32
    xs = _rand_elems(rng, spec, n)
    ys = _rand_elems(rng, spec, n)
    a, b = _limbs(spec, xs), _limbs(spec, ys)
    va = list(xs)
    p = spec.modulus
    for step in range(60):
        choice = rng.randrange(5)
        if choice == 0:
            a = F.add(spec, a, b)
            va = [(x + y) % p for x, y in zip(va, ys)]
        elif choice == 1:
            a = F.sub(spec, a, b)
            va = [(x - y) % p for x, y in zip(va, ys)]
        elif choice == 2:
            a = F.mont_mul(spec, a, b)
            rinv = pow(spec.r, p - 2, p)
            va = [x * y * rinv % p for x, y in zip(va, ys)]
        elif choice == 3:
            k = rng.choice([2, 3, 12])
            a = F.mul_small(spec, a, k)
            va = [x * k % p for x in va]
        else:
            a = F.neg(spec, a)
            va = [-x % p for x in va]
        _check_invariant(spec, a)
        assert _values(spec, a) == va, f"step {step} choice {choice}"


@pytest.mark.parametrize("name", SPECS)
def test_mont_roundtrip(rng, name):
    spec, _ = SPECS[name]
    xs = _rand_elems(rng, spec, N)
    a = _limbs(spec, xs)
    m = F.to_mont(spec, a)
    assert _values(spec, m) == [spec.to_mont_int(x) for x in xs]
    back = F.from_mont(spec, m)
    assert limbs_to_ints(back) == xs  # canonical digits


@pytest.mark.parametrize("name", SPECS)
def test_inverse(rng, name):
    spec, oracle = SPECS[name]
    xs = _rand_elems(rng, spec, 16)
    a = _limbs(spec, xs)  # treat as Montgomery-form values
    ainv = jax.jit(lambda a: F.inv(spec, a))(a)
    one = F.mont_mul(spec, a, ainv)
    assert _values(spec, one) == [spec.r] * len(xs)
    assert _values(spec, ainv) == [oracle.inv(x) for x in xs]


@pytest.mark.parametrize("name", SPECS)
def test_batch_inv(rng, name):
    spec, oracle = SPECS[name]
    xs = _rand_elems(rng, spec, 16) + [0, 1]
    a = _limbs(spec, xs)
    got = jax.jit(lambda a: F.batch_inv(spec, a))(a)
    assert _values(spec, got) == [oracle.inv(x) for x in xs]


@pytest.mark.parametrize("name", SPECS)
def test_pow_const(rng, name):
    spec, oracle = SPECS[name]
    xs = _rand_elems(rng, spec, 8)
    a = _limbs(spec, xs)
    for e in [0, 1, 2, 3, 65537, spec.modulus - 2]:
        got = _values(spec, F.pow_const(spec, a, e))
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
    # lazy representations of the same residue compare equal
    lazy = F.add(spec, a, F.const(spec, 0, (4,)))
    assert bool(np.asarray(F.eq(spec, lazy[2], a[2])))


@pytest.mark.parametrize("name", SPECS)
def test_conv_mode_parity(rng, name, monkeypatch):
    """Unrolled (TPU) and looped (CPU-test) convolution schedules are
    bit-identical."""
    spec, _ = SPECS[name]
    xs = _rand_elems(rng, spec, 8)
    ys = _rand_elems(rng, spec, 8)
    a, b = _limbs(spec, xs), _limbs(spec, ys)
    monkeypatch.setenv("ZKTPU_CONV_MODE", "loop")
    looped = np.asarray(F.mont_mul(spec, a, b))
    monkeypatch.setenv("ZKTPU_CONV_MODE", "unroll")
    unrolled = np.asarray(F.mont_mul(spec, a, b))
    assert (looped == unrolled).all()


@pytest.mark.parametrize("name", SPECS)
@pytest.mark.parametrize("k", [2, 3, 4])
def test_mont_mul_acc_fused(rng, name, k):
    """field_t.mont_mul_acc: REDC(sum of k products) with one shared
    reduction must agree with k independent Montgomery muls summed —
    including adversarial operands (0, 1, p-1, lazy values near 2B) that
    stress the shared-carry path."""
    from zcash_gpu_thesis_tpu.ops import field_t as FT

    spec, oracle = SPECS[name]
    p = spec.modulus
    edge = [0, 1, p - 1, p - 2, (1 << 381) % p if name == "fq" else p // 2]
    xs = [edge + _rand_elems(rng, spec, N - len(edge)) for _ in range(2 * k)]

    arrs = [jnp.asarray(ints_to_limbs(v, spec.n_limbs)).T for v in xs]

    @jax.jit
    def run(*ops):
        return FT.mont_mul_acc(spec, list(zip(ops[::2], ops[1::2])))

    got = np.asarray(run(*arrs)).T
    _check_invariant(spec, got)
    # REDC semantics on raw limb inputs: result = sum(a_i * b_i) / R mod p
    from zcash_gpu_thesis_tpu.constants import modinv

    rinv = modinv(1 << (12 * spec.n_limbs), p)
    want = [
        sum(xs[2 * i][j] * xs[2 * i + 1][j] for i in range(k))
        * rinv % p
        for j in range(N)
    ]
    assert _values(spec, got) == want


@pytest.mark.parametrize("name", SPECS)
def test_pallas_redc_backend_parity(rng, name, monkeypatch):
    """field_t's MXU const-conv REDC (bf16 matmuls with 7-bit operand
    splits) is bit-identical to the VPU pad-and-add path, for mont_mul
    and the fused mont_mul_acc, including lazy operands near 2B."""
    from zcash_gpu_thesis_tpu.ops import field_t as FT

    spec, _ = SPECS[name]
    p = spec.modulus
    edge = [0, 1, p - 1, p - 2]
    xs = [edge + _rand_elems(rng, spec, N - len(edge)) for _ in range(4)]
    a, b, c, d = [
        jnp.asarray(ints_to_limbs(v, spec.n_limbs)).T for v in xs
    ]

    def run():
        m = np.asarray(FT.mont_mul(spec, a, b))
        acc = np.asarray(FT.mont_mul_acc(spec, [(a, b), (c, d)]))
        return m, acc

    monkeypatch.setenv("ZKTPU_PALLAS_REDC", "vpu")
    m_vpu, acc_vpu = run()
    monkeypatch.setenv("ZKTPU_PALLAS_REDC", "mxu")
    m_mxu, acc_mxu = run()
    assert (m_vpu == m_mxu).all()
    assert (acc_vpu == acc_mxu).all()
