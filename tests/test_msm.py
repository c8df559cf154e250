"""MSM differential tests vs the python-int oracle.

Mirrors the reference's MSM testing (`multiexp.rs:337-376` naive-vs-
Pippenger and the all-GPU-variants-agree check `multiexp.rs:490-493`):
random points/scalars, edge scalars (0, 1, r-1), duplicate points (bucket
doubling — must be handled by the complete formulas), and padding.
"""

import random

import numpy as np
import pytest

from zcash_gpu_thesis_tpu.constants import R
from zcash_gpu_thesis_tpu.ops import curve as C
from zcash_gpu_thesis_tpu.ops import msm as M
from zcash_gpu_thesis_tpu.oracle import curve as O


@pytest.fixture(scope="module")
def g1pts():
    rng = random.Random(0xBEEF)
    return O.random_g1_points(rng, 12)


def _run(group, to_ints, pts, scalars, **kw):
    out = M.msm_from_ints(group, pts, scalars, **kw)
    return to_ints(group.to_affine(out))[0]


def test_g1_msm_random(g1pts):
    rng = random.Random(1)
    scalars = [rng.randrange(R) for _ in g1pts]
    want = O.g1_msm(g1pts, scalars)
    got = _run(C.G1, C.g1_affine_to_ints, g1pts, scalars)
    assert got == want


def test_g1_msm_edge_scalars(g1pts):
    scalars = [0, 1, R - 1, 2, 0, 1, 15, 16, 255, 256, 0, R - 2]
    want = O.g1_msm(g1pts, scalars)
    got = _run(C.G1, C.g1_affine_to_ints, g1pts, scalars)
    assert got == want


def test_g1_msm_duplicates_and_padding(g1pts):
    # duplicate points with equal digits force bucket doubling; n=5 is not
    # a multiple of chunks*k_inner, so padding with infinity kicks in
    pts = [g1pts[0], g1pts[0], g1pts[1], g1pts[1], g1pts[2]]
    scalars = [7, 7, 3, 5, R - 1]
    want = O.g1_msm(pts, scalars)
    got = _run(C.G1, C.g1_affine_to_ints, pts, scalars, chunks=2, k_inner=2)
    assert got == want


def test_g1_msm_zero_result(g1pts):
    pts = [g1pts[0], g1pts[0]]
    scalars = [5, R - 5]
    assert O.g1_msm(pts, scalars) is None
    got = _run(C.G1, C.g1_affine_to_ints, pts, scalars, chunks=1, k_inner=1)
    assert got is None


@pytest.mark.parametrize("c", [
    1, 4,
    pytest.param(8, marks=pytest.mark.slow),
    pytest.param(12, marks=pytest.mark.slow),
])
def test_g1_msm_window_widths(g1pts, c):
    rng = random.Random(c)
    scalars = [rng.randrange(R) for _ in g1pts]
    want = O.g1_msm(g1pts, scalars)
    got = _run(C.G1, C.g1_affine_to_ints, g1pts, scalars, c=c, chunks=4,
               k_inner=2)
    assert got == want


@pytest.mark.slow
def test_g2_msm_random():
    rng = random.Random(2)
    pts = O.random_g2_points(rng, 6)
    scalars = [rng.randrange(R) for _ in pts]
    scalars[0] = 0
    scalars[1] = 1
    want = O.g2_msm(pts, scalars)
    got = _run(C.G2, C.g2_affine_to_ints, pts, scalars, chunks=2, k_inner=2)
    assert got == want


def test_digit_decomposition():
    rng = random.Random(3)
    xs = [rng.randrange(R) for _ in range(8)] + [0, 1, R - 1]
    for c in (1, 3, 4, 8, 12):
        d = M.digits_from_ints(xs, c)
        for i, x in enumerate(xs):
            v = sum(int(d[i, w]) << (c * w) for w in range(d.shape[1]))
            assert v == x, (c, i)
    # device-side decomposition from canonical limbs agrees
    import jax.numpy as jnp

    from zcash_gpu_thesis_tpu.ops import field as F

    limbs = jnp.asarray(F.batch_to_limbs(F.FR, xs, mont=False))
    for c in (1, 4, 11):
        dev = np.asarray(M.digits_from_canonical(limbs, c))
        host = M.digits_from_ints(xs, c)
        assert (dev == host).all(), c


def test_digits_from_limbs_np_matches_device():
    """The hybrid split rebuilds the digit plane on host from the same
    int16 limb array the prover uploads — it must be bit-identical to
    the device decomposition + recode (engine._make_digits_impl)."""
    import jax.numpy as jnp

    from zcash_gpu_thesis_tpu.ops import field as F

    rng = random.Random(9)
    xs = [rng.randrange(R) for _ in range(33)] + [0, 1, R - 1]
    limbs_np = F.batch_to_limbs(F.FR, xs, mont=False).astype(np.int16)
    limbs = jnp.asarray(limbs_np).astype(jnp.int32)
    for c in (4, 6, 7):
        dev = np.asarray(
            M.recode_signed_dev(M.digits_from_canonical(limbs, c), c))
        host = M.recode_signed(M.digits_from_limbs_np(limbs_np, c), c)
        assert (dev == host).all(), c


def test_g1_msm_signed_digits(g1pts):
    """Signed-digit recoding (half the buckets) matches the oracle."""
    import jax.numpy as jnp

    rng = random.Random(77)
    scalars = [rng.randrange(R) for _ in g1pts]
    scalars[0] = 0
    scalars[1] = R - 1
    aff = C.g1_affine_from_ints(g1pts)
    sd = jnp.asarray(M.recode_signed(M.digits_from_ints(scalars, 4), 4))
    got = M.msm_host(C.G1, aff, sd, 4, 4, 2, signed=True)
    assert got == O.g1_msm(g1pts, scalars)


def test_recode_signed_reconstruction():
    rng = random.Random(78)
    xs = [rng.randrange(R) for _ in range(16)] + [0, 1, R - 1]
    for c in (2, 4, 8):
        sd = M.recode_signed(M.digits_from_ints(xs, c), c)
        assert np.abs(sd).max() <= 1 << (c - 1)
        for i, x in enumerate(xs):
            v = sum(int(sd[i, w]) << (c * w) for w in range(sd.shape[1]))
            assert v == x


@pytest.mark.slow
def test_g1_msm_pallas_interpret(g1pts):
    """The VMEM bucket kernel (interpret mode) matches the oracle."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from zcash_gpu_thesis_tpu.ops import msm_pallas as MP

    rng = random.Random(79)
    scalars = [rng.randrange(R) for _ in g1pts]
    scalars[0] = 0
    aff = C.g1_affine_from_ints(g1pts)
    sd = jnp.asarray(M.recode_signed(M.digits_from_ints(scalars, 4), 4))
    with pltpu.force_tpu_interpret_mode():
        got = MP.msm_host_pallas(C.G1, aff, sd, 4, 4, 2)
    assert got == O.g1_msm(g1pts, scalars)


@pytest.mark.slow
def test_g2_msm_pallas_interpret():
    """The field-generic VMEM bucket kernel over Fq2/G2 (interpret mode)
    matches the oracle."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from zcash_gpu_thesis_tpu.ops import msm_pallas as MP

    rng = random.Random(80)
    base = O.random_g2_points(rng, 6)
    pts = [base[i % 6] for i in range(24)]
    scalars = [rng.randrange(R) for _ in pts]
    scalars[3] = 0
    aff = C.g2_affine_from_ints(pts)
    sd = jnp.asarray(M.recode_signed(M.digits_from_ints(scalars, 4), 4))
    with pltpu.force_tpu_interpret_mode():
        got = MP.msm_host_pallas(C.G2, aff, sd, 4, 4, 2)
    assert got == O.g2_msm(pts, scalars)


@pytest.mark.slow
def test_g1_msm_pallas_interpret_c8(g1pts):
    """The wide-window (c=8, 128-bucket) kernel variant in interpret
    mode: full-array one-hot select/update plus fused-REDC mixed adds."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from zcash_gpu_thesis_tpu.ops import msm_pallas as MP

    rng = random.Random(81)
    scalars = [rng.randrange(R) for _ in g1pts]
    scalars[0] = 0
    aff = C.g1_affine_from_ints(g1pts)
    sd = jnp.asarray(M.recode_signed(M.digits_from_ints(scalars, 8), 8))
    with pltpu.force_tpu_interpret_mode():
        got = MP.msm_host_pallas(C.G1, aff, sd, 8, 2, 2)
    assert got == O.g1_msm(g1pts, scalars)


@pytest.mark.slow
def test_g1_msm_pallas_sliced(g1pts):
    """The large-n slice sweep (window_sums_pallas_sliced): n > slice_n
    splits into fixed-size kernel passes whose [W] window sums add
    projectively — must be bit-equal in value to the one-shot path,
    including a ragged final slice padded with infinity/digit-0."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from zcash_gpu_thesis_tpu.ops import msm_pallas as MP

    rng = random.Random(82)
    pts = [g1pts[i % len(g1pts)] for i in range(40)]
    scalars = [rng.randrange(R) for _ in pts]
    scalars[0] = 0
    aff = C.g1_affine_from_ints(pts)
    sd = jnp.asarray(M.recode_signed(M.digits_from_ints(scalars, 4), 4))
    with pltpu.force_tpu_interpret_mode():
        got = MP.msm_host_pallas(C.G1, aff, sd, 4, 4, 2, slice_n=16)
    assert got == O.g1_msm(pts, scalars)


@pytest.mark.slow
def test_g1_msm_pallas_device_combine(g1pts):
    """msm_host_pallas_fused: the fully device-side combine (bucket
    kernel + suffix + W-window ladder in one executable) matches the
    oracle on both the one-shot and the sliced path."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from zcash_gpu_thesis_tpu.ops import msm_pallas as MP

    rng = random.Random(83)
    pts = [g1pts[i % len(g1pts)] for i in range(40)]
    scalars = [rng.randrange(R) for _ in pts]
    aff = C.g1_affine_from_ints(pts)
    sd = jnp.asarray(M.recode_signed(M.digits_from_ints(scalars, 4), 4))
    want = O.g1_msm(pts, scalars)
    with pltpu.force_tpu_interpret_mode():
        assert MP.msm_host_pallas_fused(C.G1, aff, sd, 4, 4, 2) == want
        assert MP.msm_host_pallas_fused(
            C.G1, aff, sd, 4, 4, 2, slice_n=16) == want


@pytest.mark.slow
def test_g2_msm_pallas_device_combine():
    """The field-generic combine kernel (suffix/fold/ladder over the Fq2
    adapter) matches the oracle for G2."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from zcash_gpu_thesis_tpu.ops import msm_pallas as MP

    rng = random.Random(84)
    base = O.random_g2_points(rng, 4)
    pts = [base[i % 4] for i in range(8)]
    scalars = [rng.randrange(R) for _ in pts]
    aff = C.g2_affine_from_ints(pts)
    sd = jnp.asarray(M.recode_signed(M.digits_from_ints(scalars, 4), 4))
    want = O.g2_msm(pts, scalars)
    with pltpu.force_tpu_interpret_mode():
        assert MP.msm_host_pallas_fused(C.G2, aff, sd, 4, 2, 2) == want


@pytest.mark.slow
def test_msm_hybrid_window_split(g1pts):
    """The thesis's proposed CPU+device window split (Chapter7.tex:86,
    lower_half kernels bls12-381.cl:2496-2553): top-k windows on a host
    thread, low windows through the device kernel, one scaled combine.
    Must match the oracle for several split points including all-host
    and all-device."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from zcash_gpu_thesis_tpu.ops.msm_hybrid import msm_hybrid

    rng = random.Random(85)
    pts = [g1pts[i % len(g1pts)] for i in range(24)]
    pts[5] = None
    scalars = [rng.randrange(R) for _ in pts]
    scalars[0] = 0
    aff = C.g1_affine_from_ints(pts)
    sd = M.recode_signed(M.digits_from_ints(scalars, 4), 4)
    want = O.g1_msm([p for p in pts if p is not None],
                    [s for p, s in zip(pts, scalars) if p is not None])
    with pltpu.force_tpu_interpret_mode():
        for hw in (0, 3, 60):
            got = msm_hybrid(C.G1, "g1", pts, aff, sd, 4, 4, 2,
                             host_windows=hw)
            assert got == want, hw
