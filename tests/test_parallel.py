"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The reference has no multi-device path (one OpenCL queue,
multiexp.rs:2839); these tests cover the TPU-native scaling layer —
point-sharded MSM and the four-step all_to_all NTT — against the
single-device kernels (SURVEY.md §4 "multi-node testing" note).
"""

import random

import numpy as np
import pytest

# Entirely compile-bound (8-device shard_map graphs take minutes each to
# build on the CPU backend) and fully covered by the driver-run
# __graft_entry__.dryrun_multichip every round — slow tier.
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from zcash_gpu_thesis_tpu.constants import R
from zcash_gpu_thesis_tpu.ops import curve as cv
from zcash_gpu_thesis_tpu.ops import field as F
from zcash_gpu_thesis_tpu.ops import msm as M
from zcash_gpu_thesis_tpu.ops.curve import G1
from zcash_gpu_thesis_tpu.ops.ntt import Domain
from zcash_gpu_thesis_tpu.oracle import curve as O
from zcash_gpu_thesis_tpu.parallel import mesh as pm


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return pm.default_mesh(8)


def test_sharded_msm_matches_single(mesh8):
    rng = random.Random(21)
    base = O.random_g1_points(rng, 4)
    n = 64
    pts = [base[i % 4] for i in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    aff = cv.g1_affine_from_ints(pts)
    digits = jnp.asarray(M.digits_from_ints(scalars, 4))

    got = pm.sharded_msm(G1, aff, digits, mesh8, c=4, chunks=2, k_inner=2)
    want = M.msm(G1, aff, digits, 4, 2, 2)
    assert np.asarray(G1.eq(got, want)).all()


def test_sharded_msm_g2_matches_single(mesh8):
    # regression: out_specs must follow the projective output structure,
    # which differs from the affine input structure for G2 (6 vs 5 leaves)
    rng = random.Random(23)
    base = O.random_g2_points(rng, 4)
    n = 32
    pts = [base[i % 4] for i in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    aff = cv.g2_affine_from_ints(pts)
    digits = jnp.asarray(M.digits_from_ints(scalars, 4))

    got = pm.sharded_msm(cv.G2, aff, digits, mesh8, c=4, chunks=2, k_inner=2)
    want = M.msm(cv.G2, aff, digits, 4, 2, 2)
    assert np.asarray(cv.G2.eq(got, want)).all()


def test_sharded_msm_signed_digits(mesh8):
    rng = random.Random(24)
    base = O.random_g1_points(rng, 4)
    n = 64
    pts = [base[i % 4] for i in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    aff = cv.g1_affine_from_ints(pts)
    digits = jnp.asarray(M.recode_signed(M.digits_from_ints(scalars, 4), 4))

    got = pm.sharded_msm(G1, aff, digits, mesh8, c=4, chunks=2, k_inner=2,
                         signed=True)
    want = M.msm(G1, aff, digits, 4, 2, 2, signed=True)
    assert np.asarray(G1.eq(got, want)).all()


@pytest.mark.parametrize("inverse", [False, True])
def test_sharded_ntt_matches_single(mesh8, inverse):
    rng = random.Random(22)
    n = 256  # n1 = 16, n2 = 16, both divisible by 8
    xs = [rng.randrange(R) for _ in range(n)]
    a = jnp.asarray(F.batch_to_limbs(F.FR, xs))
    got = pm.sharded_ntt(n, a, mesh8, inverse=inverse)
    d = Domain(n)
    want = d.ifft(a) if inverse else d.fft(a)
    assert (np.asarray(F.canon(F.FR, got)) == np.asarray(F.canon(F.FR, want))).all()


@pytest.mark.parametrize("inverse", [False, True])
def test_sharded_ntt_mxu_matches_single(mesh8, inverse):
    """The mesh MXU four-step (local fft_t_mxu passes + one all_to_all)
    == the single-device transform, and == the butterfly mesh form."""
    rng = random.Random(23)
    n = 256
    xs = [rng.randrange(R) for _ in range(n)]
    a = jnp.asarray(F.batch_to_limbs(F.FR, xs))
    tabs = pm.mesh_ntt_tables(n, 8, inverse=inverse)
    got = pm.sharded_ntt_mxu(n, a, mesh8, tabs, inverse=inverse)
    d = Domain(n)
    want = d.ifft(a) if inverse else d.fft(a)
    canon = lambda x: np.asarray(F.canon(F.FR, x))
    assert (canon(got) == canon(want)).all()
    bfly = pm.sharded_ntt(n, a, mesh8, inverse=inverse)
    assert (canon(got) == canon(bfly)).all()


def test_h_poly_sharded_mxu_matches_single(mesh8):
    """Full mesh H(x) chain with MXU locals == the single-device
    h_poly_dev digits (the production mesh-prover path)."""
    from zcash_gpu_thesis_tpu.groth16.engine import _BlsDomain

    rng = random.Random(24)
    n = 256
    d = _BlsDomain(n)
    vecs = [[rng.randrange(R) for _ in range(n)] for _ in range(3)]
    devs = [jnp.asarray(F.batch_to_limbs(F.FR, v)) for v in vecs]
    want = np.asarray(d.h_poly_dev(*devs))
    tabs = pm.h_poly_tables(n, mesh8)
    got = np.asarray(pm.h_poly_sharded(n, *devs, mesh8, tabs=tabs))
    assert (got == want).all()


def test_sharded_msm_packed_matches_oracle():
    """Per-shard full device pipeline (packed point out) + host combine
    == oracle; the first-class mesh MSM form (slice chaining included
    via msm_device_proj).  Tiny shapes / 2-device mesh: interpret-mode
    pallas inside shard_map is trace-and-execute heavy."""
    from jax.experimental.pallas import tpu as pltpu

    rng = random.Random(41)
    n, c = 32, 4
    mesh2 = pm.default_mesh(2)
    base = O.random_g1_points(rng, 4)
    pts = [base[i % 4] for i in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    aff = cv.g1_affine_from_ints(pts)
    digits = jnp.asarray(
        M.recode_signed(M.digits_from_ints(scalars, c), c))
    with pltpu.force_tpu_interpret_mode():
        parts = pm.sharded_msm_packed(G1, aff, digits, mesh2, c,
                                      chunks=2, k_inner=2)
        got = pm.packed_parts_to_int(G1, np.asarray(parts), "g1")
    want = None
    for p, s in zip(pts, scalars):
        want = O.g1_add(want, O.g1_mul(p, s))
    assert got == want


def test_engine_mesh_async_hybrid(monkeypatch):
    """The prover-facing async MSM under ZKTPU_MESH: sharded device sweep
    + native host top-windows must equal the single-device result."""
    from jax.experimental.pallas import tpu as pltpu

    from zcash_gpu_thesis_tpu import native as NV
    from zcash_gpu_thesis_tpu.groth16.engine import BlsEngine
    from zcash_gpu_thesis_tpu.ops import field as F2

    if not NV.available():
        pytest.skip("native library not built")
    rng = random.Random(42)
    e = BlsEngine()
    n = 32
    base = O.random_g1_points(rng, 4)
    bases = [base[i % 4] for i in range(n)]
    scal_ints = [rng.randrange(R) for _ in range(n)]
    scal_dev = jnp.asarray(F2.batch_to_limbs(F2.FR, scal_ints,
                                             mont=False))
    limbs = F2.batch_to_limbs(F2.FR, scal_ints, mont=False)
    want = None
    for p, s in zip(bases, scal_ints):
        want = O.g1_add(want, O.g1_mul(p, s))

    monkeypatch.setenv("ZKTPU_MSM_IMPL", "pallas")
    monkeypatch.setenv("ZKTPU_MSM_C", "4")
    monkeypatch.setenv("ZKTPU_MESH", "2")
    monkeypatch.setenv("ZKTPU_MSM_HYBRID_WINDOWS", "2")
    BlsEngine.clear_base_cache()
    BlsEngine._digits_cache.clear()
    BlsEngine._stage_cache.clear()
    with pltpu.force_tpu_interpret_mode():
        resolve = e.msm_g1_async(bases, scal_dev, host_limbs=limbs)
        got = resolve()
    assert got == want


def test_engine_mesh_mode(mesh8, monkeypatch):
    """ZKTPU_MESH=N routes the production engine's device-scalar MSMs and
    the H(x) chain through the sharded paths; results must match the
    single-device engine bit-for-bit."""
    import jax.numpy as jnp

    from zcash_gpu_thesis_tpu.groth16.engine import BlsEngine, _BlsDomain
    from zcash_gpu_thesis_tpu.ops import field as F2

    rng = random.Random(31)
    e = BlsEngine()

    n = 128
    base = O.random_g1_points(rng, 4)
    bases = [base[i % 4] for i in range(n)]
    scal_ints = [rng.randrange(R) for _ in range(n)]
    scal_dev = jnp.asarray(F2.batch_to_limbs(F2.FR, scal_ints, mont=False))

    want = e._msm_dev("g1", bases, scal_dev)
    m = 64
    d = _BlsDomain(m)
    av = [rng.randrange(R) for _ in range(m)]
    bv = [rng.randrange(R) for _ in range(m)]
    cv2 = [rng.randrange(R) for _ in range(m)]
    am, bm, cm = (jnp.asarray(F2.batch_to_limbs(F2.FR, v))
                  for v in (av, bv, cv2))
    want_h = np.asarray(d.h_poly_dev(am, bm, cm))

    monkeypatch.setenv("ZKTPU_MESH", "8")
    BlsEngine.clear_base_cache()
    BlsEngine._digits_cache.clear()
    got = e._msm_dev("g1", bases, scal_dev)
    d2 = _BlsDomain(m)
    got_h = np.asarray(d2.h_poly_dev(am, bm, cm))

    assert got == want
    assert (got_h == want_h).all()


def test_ntt_mesh_collective_payload_model(mesh8):
    """The scaling model (scripts/scaling_report.py --model) assumes the
    mesh NTT issues ONE logical all-to-all whose per-device payload is
    exactly the shard (n * L * 4 / N bytes).  Pin that contract against
    the compiled HLO so a layout change invalidates the model loudly."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.scaling_report import _a2a_payload_bytes

    n = 1 << 12
    x = jnp.zeros((n, 24), jnp.int32)
    tabs = pm.mesh_ntt_tables(n, 8)
    got = _a2a_payload_bytes(
        lambda x, t: pm.sharded_ntt_mxu(n, x, mesh8, t), x, tabs)
    assert got == n * 24 * 4 // 8
