"""NTT differential tests vs the python-int DFT oracle.

Mirrors the reference's FFT test strategy (`domain.rs:378-494`):
naive-vs-fast comparison, fft∘ifft round trips, coset round trips, and the
full H(x)-style pipeline (polynomial multiplication through the domain).
"""

import random

import pytest

import jax
import jax.numpy as jnp

from zcash_gpu_thesis_tpu.constants import R
from zcash_gpu_thesis_tpu.ops import field as F
from zcash_gpu_thesis_tpu.ops.ntt import Domain, powers
from zcash_gpu_thesis_tpu.oracle import ntt as O


@pytest.mark.parametrize("n", [2, 8, 64, 256])
def test_fft_vs_naive(rng, n):
    d = Domain(n)
    xs = [rng.randrange(R) for _ in range(n)]
    got = d.to_ints(jax.jit(d.fft)(d.from_ints(xs)))
    assert got == O.naive_dft(xs, d.omega)


@pytest.mark.parametrize("n", [8, 128])
def test_ifft_roundtrip(rng, n):
    d = Domain(n)
    xs = [rng.randrange(R) for _ in range(n)]
    a = d.from_ints(xs)
    assert d.to_ints(d.ifft(d.fft(a))) == xs
    assert d.to_ints(d.fft(d.ifft(a))) == xs


@pytest.mark.parametrize("n", [8, 64])
def test_coset_roundtrip_and_eval(rng, n):
    d = Domain(n)
    xs = [rng.randrange(R) for _ in range(n)]
    a = d.from_ints(xs)
    assert d.to_ints(d.coset_fft(a)) == O.coset_eval(xs, n)
    assert d.to_ints(d.icoset_fft(d.coset_fft(a))) == xs


def test_powers(rng):
    g = rng.randrange(1, R)
    got = F.batch_from_limbs(F.FR, powers(g, 13))
    assert got == [pow(g, i, R) for i in range(13)]


def test_poly_mul_via_domain(rng):
    """fft_composition analogue (domain.rs:378-423): multiply two
    polynomials through coset evaluation and compare against schoolbook."""
    na, nb = 5, 7
    a = [rng.randrange(R) for _ in range(na)]
    b = [rng.randrange(R) for _ in range(nb)]
    n = 16  # >= deg(a*b)+1
    d = Domain(n)
    ea = d.coset_fft(d.from_ints(a))
    eb = d.coset_fft(d.from_ints(b))
    prod = d.icoset_fft(d.mul_assign(ea, eb))
    want = O.poly_mul(a, b) + [0] * (n - na - nb + 1)
    assert d.to_ints(prod) == want


def test_divide_by_z_on_coset(rng):
    """Multiplying coset evaluations by Z(gx) = g^n - 1 and dividing again
    round-trips (the heart of the H(x) computation, prover.rs:256-283)."""
    d = Domain(16)
    t = d.from_ints([rng.randrange(R) for _ in range(16)])
    et = d.coset_fft(t)
    z_const = (pow(d.gen, d.n, R) - 1) % R
    ez = F.mont_mul(F.FR, et, F.mont_const(F.FR, z_const, (1,)))
    back = d.divide_by_z_on_coset(ez)
    assert d.to_ints(d.icoset_fft(back)) == d.to_ints(t)


def test_group_fft_matches_oracle(rng):
    """FFT over G1 points (domain.rs Group/Point abstraction) vs direct
    DFT with python-int curve ops."""
    from zcash_gpu_thesis_tpu.constants import R
    from zcash_gpu_thesis_tpu.ops import curve as cv
    from zcash_gpu_thesis_tpu.ops import field as F
    from zcash_gpu_thesis_tpu.ops.ntt_group import GroupDomain
    from zcash_gpu_thesis_tpu.oracle import curve as O

    n = 8
    ks = [rng.randrange(1, R) for _ in range(n)]
    pts_int = [O.g1_mul(O.G1_GEN, k) for k in ks]
    d = GroupDomain(n)
    x, y, _inf = cv.g1_affine_from_ints(pts_int)
    proj = (x, y, F.one_mont(F.FQ, (n,)))
    out = d.fft(proj)
    got = cv.g1_affine_to_ints(cv.G1.to_affine(out))
    omega = d._d.omega
    for i in range(n):
        acc = None
        for j in range(n):
            acc = O.g1_add(acc, O.g1_mul(pts_int[j], pow(omega, i * j, R)))
        assert got[i] == acc
    back = d.ifft(out)
    assert cv.g1_affine_to_ints(cv.G1.to_affine(back)) == pts_int
