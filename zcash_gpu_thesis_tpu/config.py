"""Runtime configuration.

The reference's "config system" is compile-time only: Cargo features
(``u128-support``, ``opencl_vendor_mesa``), commented-out lines in
``run_tests`` (multiexp.rs:538-593) and kernel #defines
(bls12-381.cl:193-238).  This replaces it with one typed, env-overridable
config object consulted by the kernels.

Environment overrides:
  ZKTPU_CONV_MODE   unroll | loop     (conv scheduling; field.py)
  ZKTPU_REDC        mxu | vpu         (REDC const-conv backend; field.py)
  ZKTPU_MSM_IMPL    pallas | xla      (bucket accumulation path)
  ZKTPU_MSM_C       window bit width  (default 4)
  ZKTPU_MSM_CHUNKS  parallel chunks   (default backend-dependent)
  ZKTPU_MSM_K       points per chunk per step
"""

from __future__ import annotations

import dataclasses
import os


def _backend() -> str:
    import jax

    return jax.default_backend()


@dataclasses.dataclass
class MsmConfig:
    impl: str
    c: int
    chunks: int
    k_inner: int
    signed: bool = True


def msm_config() -> MsmConfig:
    on_tpu = _backend() != "cpu"
    impl = os.environ.get("ZKTPU_MSM_IMPL", "pallas" if on_tpu else "xla")
    return MsmConfig(
        impl=impl,
        # c=7 measured optimum on v5e for the 131k G1 full device sweep
        # (204.7 ms vs 213.7 at c=6, 222.4 at c=5, round-5 kbench):
        # madd work ~W=37 shrinks faster than the one-hot select's
        # ~2^(c-1) growth costs up to this width
        c=int(os.environ.get("ZKTPU_MSM_C", "7")),
        chunks=int(os.environ.get("ZKTPU_MSM_CHUNKS",
                                  "32" if on_tpu else "8")),
        k_inner=int(os.environ.get("ZKTPU_MSM_K", "4")),
    )


def conv_unrolled() -> bool:
    mode = os.environ.get("ZKTPU_CONV_MODE")
    if mode:
        return mode == "unroll"
    return _backend() != "cpu"


def redc_mxu() -> bool:
    mode = os.environ.get("ZKTPU_REDC")
    if mode:
        return mode == "mxu"
    return _backend() != "cpu"


def pallas_redc_mxu() -> bool:
    """Pallas-side REDC const-convs as exact bf16 MXU matmuls (field_t).

    Default on for every backend: the math is bit-identical to the VPU
    pad-and-add path (7-bit operand splits keep all products/sums exact
    in bf16/f32), it moves ~40% of a Montgomery multiply's MACs off the
    VPU, and it shrinks the unrolled Mosaic graph (the G2 kernel's
    compile-time hog).  ZKTPU_PALLAS_REDC=vpu restores the old path.
    """
    mode = os.environ.get("ZKTPU_PALLAS_REDC")
    if mode:
        return mode == "mxu"
    return True


def ntt_impl() -> str:
    """NTT backend: 'mxu' (DFT-by-matmul passes + Pallas reduction tail,
    ops.ntt_mxu) or 'bfly' (radix-2 butterfly stages).  ZKTPU_NTT
    overrides.  Default mxu everywhere — the two paths are bit-identical
    (tested) and mxu is faster on both backends at production sizes."""
    return os.environ.get("ZKTPU_NTT", "mxu")


def ntt_pallas_tail() -> bool:
    """Run the NTT pass tail (fold+ripple+REDC+twiddle) as a Pallas VMEM
    kernel.  Default on TPU only; the XLA form is bit-identical and is
    what the CPU test backend runs.  ZKTPU_NTT_TAIL=pallas|xla."""
    mode = os.environ.get("ZKTPU_NTT_TAIL")
    if mode:
        return mode == "pallas"
    return _backend() != "cpu"


def g2_msm_impl() -> str:
    """G2 MSM backend: 'pallas' (VMEM bucket kernel) or 'xla' (scan path).

    Separate from the G1 switch because the Fq2 kernel's Mosaic compile
    is much heavier; ZKTPU_G2_IMPL overrides.
    """
    if msm_config().impl != "pallas":
        return "xla"
    return os.environ.get("ZKTPU_G2_IMPL", "pallas")


def g2_pallas_params() -> tuple:
    """(chunks, k_inner) for the G2 Pallas kernel (ZKTPU_G2_CHUNKS/K)."""
    return (int(os.environ.get("ZKTPU_G2_CHUNKS", "16")),
            int(os.environ.get("ZKTPU_G2_K", "8")))


def msm_hybrid_windows() -> int:
    """Top windows accumulated on the host, overlapped with the device
    sweep (ZKTPU_MSM_HYBRID_WINDOWS; the thesis's proposed CPU+GPU
    window split, Chapter7.tex:86).  -1 = balance the split from the
    measured host/device per-window rates (ops/msm_hybrid.py); 0 = all
    device.  Default: -1 on TPU when the native host bucket worker is
    built (native/zktpu_native.cpp), else 0 — the python-int fallback
    host path is ~10^3x slower than the VMEM kernel and always loses."""
    v = os.environ.get("ZKTPU_MSM_HYBRID_WINDOWS")
    if v is not None:
        return int(v)
    from . import native as NV

    return -1 if (_backend() != "cpu" and NV.available()) else 0


def msm_hybrid_c() -> int:
    """G1 window width when the hybrid host split is active
    (ZKTPU_MSM_HYBRID_C).  Measured on v5e at 131k: the hybrid total is
    best at c=6 (0.19 s; the host absorbs ~5 of 43 cheap-per-window
    sweeps) while the pure-device sweep is best at c=7 (204.7 ms vs
    213.7) — the host share shrinks faster than the device sweep gains
    as windows widen, so the two modes want different widths."""
    return int(os.environ.get("ZKTPU_MSM_HYBRID_C", "6"))


def g2_c() -> int:
    """G2 window bit width (ZKTPU_G2_C).  Separate from the G1 width:
    the Fq2 madd is ~3x the element work per lane, so the select/madd
    crossover sits at a different c.  Sweep on v5e, 2^16 G2 MSM:
    c=7 334 ms < c=6 346 ms < c=4 438 ms; c=8 OOMs VMEM (the 128-bucket
    state needs 148 MB of the 128 MB VMEM at chunks=16)."""
    return int(os.environ.get("ZKTPU_G2_C", "7"))


def mesh_devices() -> int:
    """Multi-chip engine mode: ZKTPU_MESH=N routes the prover's MSMs and
    the H(x) NTT chain through the mesh-sharded paths (parallel.mesh)
    over the first N jax devices.  0/unset = single-device paths.  The
    reference has no analog (single OpenCL queue, multiexp.rs:2839);
    this is the TPU-native scaling axis."""
    return int(os.environ.get("ZKTPU_MESH", "0"))


def g2_pad_floor() -> int:
    """Minimum padded size for large G2 MSMs on the pallas path.

    The Fq2 kernel's Mosaic compile is the expensive one, so all
    production G2 MSMs pad up to one canonical slice size and larger n
    sweeps that single compiled executable (msm_pallas slicing).  2^16
    matches the density-compacted Sapling b_g2 vector (61,301 live bases)
    in one slice; Sprout's ~2M-base vector runs as 32 slices.
    ZKTPU_G2_PAD_FLOOR overrides (set 1 to disable).
    """
    return int(os.environ.get("ZKTPU_G2_PAD_FLOOR", str(1 << 16)))

def fq2_schoolbook() -> bool:
    """Fq2 single-product strategy in the G2 bucket kernel
    (ZKTPU_FQ2_MUL=schoolbook|karatsuba): schoolbook = 4 products with
    one shared REDC per component (mont_mul_acc), karatsuba = 3 products
    with 3 REDCs.  Default schoolbook (measured faster on v5e where the
    REDC const-convs ride the MXU)."""
    return os.environ.get("ZKTPU_FQ2_MUL", "schoolbook") != "karatsuba"
