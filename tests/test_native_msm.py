"""Native host Pippenger (native/zktpu_native.cpp) vs the python-int
oracle — the same differential-oracle strategy the reference applies to
every device kernel (SURVEY.md §4 tier 2), here covering the native CPU
path (the analog of bellman's CPU multiexp, multiexp.rs:140-232) and the
hybrid window split built on it (Chapter7.tex:86)."""

import random

import numpy as np
import pytest

from zcash_gpu_thesis_tpu import native as NV
from zcash_gpu_thesis_tpu.oracle import curve as O
from zcash_gpu_thesis_tpu.ops import msm as M

pytestmark = pytest.mark.skipif(
    not NV.available(), reason="native library not built (make -C native)"
)


def _ladder(sums, c, add):
    acc = None
    for wsum in reversed(sums):
        for _ in range(c):
            acc = add(acc, acc)
        acc = add(acc, wsum)
    return acc


@pytest.mark.parametrize("c", [4, 6])
def test_native_g1_msm(c):
    rng = random.Random(11)
    n = 256
    pts = O.random_g1_points(rng, 16)
    bases = [pts[i % 16] for i in range(n)]
    bases[3] = None  # infinity base contributes nothing
    scalars = [rng.randrange(O.R) for _ in range(n)]
    scalars[7] = 0
    digits = M.recode_signed(M.digits_from_ints(scalars, c), c)
    st = NV.MsmStage(bases, g2=False)
    sums = st.window_sums(digits.astype(np.int8), 0, digits.shape[1], c)
    got = _ladder(sums, c, O.g1_add)
    want = O.g1_msm([b for b in bases if b is not None],
                    [s for b, s in zip(bases, scalars) if b is not None])
    assert got == want


def test_native_g2_msm():
    rng = random.Random(12)
    c, n = 6, 96
    pts = O.random_g2_points(rng, 8)
    bases = [pts[i % 8] for i in range(n)]
    scalars = [rng.randrange(O.R) for _ in range(n)]
    digits = M.recode_signed(M.digits_from_ints(scalars, c), c)
    st = NV.MsmStage(bases, g2=True)
    sums = st.window_sums(digits.astype(np.int8), 0, digits.shape[1], c)
    assert _ladder(sums, c, O.g2_add) == O.g2_msm(bases, scalars)


def test_native_window_split():
    """Host-high + host-low halves recombine to the full MSM — the
    algebra the hybrid split relies on."""
    rng = random.Random(13)
    c, n = 6, 128
    pts = O.random_g1_points(rng, 8)
    bases = [pts[i % 8] for i in range(n)]
    scalars = [rng.randrange(O.R) for _ in range(n)]
    digits = M.recode_signed(M.digits_from_ints(scalars, c), c).astype(
        np.int8)
    W = digits.shape[1]
    st = NV.MsmStage(bases, g2=False)
    lo_w = W - 5
    hi = _ladder(st.window_sums(digits, lo_w, W, c), c, O.g1_add)
    lo = _ladder(st.window_sums(digits, 0, lo_w, c), c, O.g1_add)
    if hi is not None:
        hi = O.g1_mul(hi, (1 << (c * lo_w)) % O.R)
    assert O.g1_add(lo, hi) == O.g1_msm(bases, scalars)


def test_hybrid_stage_path_cpu():
    """msm_hybrid with a native stage on the CPU/XLA device path (pallas
    interpret not needed: impl falls back through msm_host_pallas_fused
    only on TPU; here we exercise the host half + combine algebra against
    the oracle directly)."""
    from zcash_gpu_thesis_tpu.ops.msm_hybrid import (
        _host_window_sums_native, auto_host_windows, make_stage)

    rng = random.Random(14)
    c, n = 6, 64
    pts = O.random_g1_points(rng, 8)
    bases = [pts[i % 8] for i in range(n)]
    scalars = [rng.randrange(O.R) for _ in range(n)]
    digits = M.recode_signed(M.digits_from_ints(scalars, c), c).astype(
        np.int8)
    W = digits.shape[1]
    k = auto_host_windows("g1", W)
    assert 1 <= k < W
    lo_w = W - k
    stage = make_stage(bases, "g1")
    hi = _host_window_sums_native(stage, digits, c, lo_w)
    lo = _ladder(stage.window_sums(digits, 0, lo_w, c), c, O.g1_add)
    if hi is not None:
        hi = O.g1_mul(hi, (1 << (c * lo_w)) % O.R)
    assert O.g1_add(lo, hi) == O.g1_msm(bases, scalars)
