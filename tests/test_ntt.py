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


# ---------------------------------------------------------------------------
# MXU matmul NTT (ops.ntt_mxu): parity with the butterfly path + the
# matrix-folded scalings.  The Domain default (config.ntt_impl) routes
# through this path, so the tests above already exercise it end-to-end;
# these pin the two impls against each other and the folding algebra.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [8, 64, 512, 4096])
def test_mxu_matches_butterfly(rng, n):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from zcash_gpu_thesis_tpu.constants import R
    from zcash_gpu_thesis_tpu.ops import field as F
    from zcash_gpu_thesis_tpu.ops import ntt_mxu as NM
    from zcash_gpu_thesis_tpu.ops.ntt import Domain

    d = Domain(n)
    xs = [rng.randrange(R) for _ in range(n)]
    a = jnp.asarray(F.batch_to_limbs(F.FR, xs))
    at = jnp.swapaxes(a, 0, 1)
    tws_f = NM.make_twiddles(n, d.omega)
    tws_i = NM.make_twiddles(n, d.omega_inv)

    def ints(t):
        return F.batch_from_limbs(F.FR, np.asarray(jnp.swapaxes(t, 0, 1)))

    # bfly reference (bypasses the impl switch)
    bfly = jax.jit(lambda x: d._fft(x, d.omega))
    want = F.batch_from_limbs(F.FR, np.asarray(bfly(a)))
    got = ints(jax.jit(lambda x: NM.fft_t_mxu(x, d.omega, n, tws_f))(at))
    assert got == want

    # coset via column-scale folding == distribute_powers + fft
    from zcash_gpu_thesis_tpu.ops import ntt as N
    coset = jax.jit(lambda x: d._fft(
        F.mont_mul(F.FR, x, N.powers(d.gen, n)), d.omega))
    want = F.batch_from_limbs(F.FR, np.asarray(coset(a)))
    got = ints(jax.jit(lambda x: NM.fft_t_mxu(
        x, d.omega, n, tws_f, col_scale=d.gen))(at))
    assert got == want

    # icoset via row-scale + const folding
    icoset = jax.jit(lambda x: F.mont_mul(
        F.FR,
        F.mont_mul(F.FR, d._fft(x, d.omega_inv),
                   F.mont_const(F.FR, d.n_inv, (1,))),
        N.powers(d.gen_inv, n)))
    want = F.batch_from_limbs(F.FR, np.asarray(icoset(a)))
    got = ints(jax.jit(lambda x: NM.fft_t_mxu(
        x, d.omega_inv, n, tws_i, row_scale=d.gen_inv,
        const_scale=d.n_inv))(at))
    assert got == want


def test_mxu_canonical_form_chain(rng):
    """Canonical-form flow: canonical limbs in -> canonical DFT out
    (the R bookkeeping rides the Montgomery-form matrices)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from zcash_gpu_thesis_tpu.constants import R
    from zcash_gpu_thesis_tpu.ops import field as F
    from zcash_gpu_thesis_tpu.ops import ntt_mxu as NM
    from zcash_gpu_thesis_tpu.ops.ntt import Domain

    n = 256
    d = Domain(n)
    xs = [rng.randrange(R) for _ in range(n)]
    ac = jnp.swapaxes(
        jnp.asarray(F.batch_to_limbs(F.FR, xs, mont=False)), 0, 1)
    tws = NM.make_twiddles(n, d.omega)
    got = F.batch_from_limbs(
        F.FR,
        np.asarray(jnp.swapaxes(
            jax.jit(lambda x: NM.fft_t_mxu(x, d.omega, n, tws))(ac), 0, 1)),
        mont=False)
    want = [sum(x * pow(d.omega, i * j, R) for j, x in enumerate(xs)) % R
            for i in range(n)]
    assert got == want


def test_mulsub_rows(rng):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from zcash_gpu_thesis_tpu.constants import R
    from zcash_gpu_thesis_tpu.ops import field as F
    from zcash_gpu_thesis_tpu.ops import ntt_mxu as NM

    n = 512
    xs = [rng.randrange(R) for _ in range(n)]
    ys = [rng.randrange(R) for _ in range(n)]
    zs = [rng.randrange(R) for _ in range(n)]
    t = lambda v: jnp.swapaxes(jnp.asarray(F.batch_to_limbs(F.FR, v)), 0, 1)
    got = F.batch_from_limbs(
        F.FR,
        np.asarray(jnp.swapaxes(jax.jit(NM.mulsub_rows)(
            t(xs), t(ys), t(zs)), 0, 1)))
    assert got == [(x * y - z) % R for x, y, z in zip(xs, ys, zs)]


def test_engine_h_poly_canon_matches_oracle(rng):
    """The engine's canonical-form MXU H(x) chain vs the python-int QAP
    oracle (prover.rs:256-283 semantics)."""
    import numpy as np

    import jax.numpy as jnp

    from zcash_gpu_thesis_tpu.constants import R, modinv
    from zcash_gpu_thesis_tpu.groth16.engine import BlsEngine
    from zcash_gpu_thesis_tpu.ops import field as F

    n = 64
    e = BlsEngine()
    dom = e.domain(n)
    a = [rng.randrange(R) for _ in range(n)]
    b = [rng.randrange(R) for _ in range(n)]
    c = [rng.randrange(R) for _ in range(n)]

    def pack(v):
        return jnp.asarray(
            F.batch_to_limbs(F.FR, v, mont=False).astype(np.int16))

    h = np.asarray(dom.h_poly_dev_canon(pack(a), pack(b), pack(c)))
    # raw limbs must be EXACT canonical digits (the MSM digit
    # decomposition reads them bitwise — lazy limbs would silently
    # corrupt the h MSM)
    assert h.min() >= 0 and h.max() < (1 << 12)
    vals = [sum(int(h[i, k]) << (12 * k) for k in range(h.shape[1]))
            for i in range(n)]
    assert all(v < R for v in vals)

    # oracle: the engine's already-tested python-int facade
    want = dom.h_poly(a, b, c)
    assert vals[:-1] == [w % R for w in want] and vals[-1] == 0
