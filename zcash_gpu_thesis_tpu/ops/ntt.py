"""Radix-2 NTT / polynomial evaluation domain over Fr.

TPU-native re-design of the reference's ``EvaluationDomain``
(``bellman/src/domain.rs``): same semantics — in-place radix-2
Cooley–Tukey over the 2-adic subgroup of Fr^* (``serial_fft``,
``domain.rs:272-315``), coset evaluation via ``distribute_powers``
(``domain.rs:105``), vanishing-polynomial division on the coset
(``domain.rs:146``) — but vectorized: each butterfly stage is one
full-width batched field multiply + add/sub over ``[n/2, L]`` limb arrays,
the bit-reversal is a single gather, and twiddle tables are generated on
device in log(n) doubling steps (no host-side power loops, so 2^23-point
domains are as cheap to set up as 2^10).

The reference's ``parallel_fft`` (``domain.rs:317-374``) decomposes one FFT
into 2^k interleaved sub-FFTs for a thread pool; here the single-device
form needs no such split (the VPU vectorizes across butterflies), and the
multi-chip split lives in ``parallel/`` as mesh-sharded stages.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..constants import FR_GENERATOR, FR_ROOT_OF_UNITY, FR_TWO_ADICITY, R, modinv
from . import field as F

FR = F.FR


def _bitrev_indices(n: int) -> np.ndarray:
    log_n = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev.astype(np.int32)


def powers(base_int: int, n: int):
    """Device array [n, L] of Montgomery-form powers base^0 .. base^(n-1).

    Built by log2(n) doubling steps: [p] -> [p, p * base^len(p)].
    """
    acc = F.one_mont(FR, (1,))
    k = 1
    while k < n:
        step = F.mont_const(FR, pow(base_int, k, R), (1,))
        acc = jnp.concatenate([acc, F.mont_mul(FR, acc, step)], axis=0)
        k *= 2
    return acc[:n]


class Domain:
    """Evaluation domain of size n = 2^k <= 2^32 (Fr 2-adicity, fr.rs S=32).

    Mirrors ``EvaluationDomain::from_coeffs`` (``domain.rs:48``): omega is
    the canonical 2^k-th root of unity ROOT_OF_UNITY^(2^(S-k)).
    """

    def __init__(self, n: int):
        assert n & (n - 1) == 0 and n >= 2, "domain size must be a power of 2"
        self.log_n = n.bit_length() - 1
        assert self.log_n <= FR_TWO_ADICITY, "domain too large for Fr 2-adicity"
        self.n = n
        self.omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - self.log_n), R)
        self.omega_inv = modinv(self.omega, R)
        self.n_inv = modinv(n, R)
        self.gen = FR_GENERATOR
        self.gen_inv = modinv(FR_GENERATOR, R)
        self._bitrev = jnp.asarray(_bitrev_indices(n))
        # jitted entry points: eager dispatch is pathological through the
        # remote-TPU tunnel (one HTTP round trip per op)
        import jax

        from ..config import ntt_impl

        self.impl = ntt_impl() if n >= 8 else "bfly"
        self._tws = {}  # omega_int -> per-pass twiddle tables (mxu impl)
        self._mats = {}  # (omega, col, row, const) -> per-pass matrices
        if self.impl == "mxu":
            from . import ntt_mxu as NM

            m = self._mxu = NM
            self._jit_fft = jax.jit(
                lambda a, tws, mats: m.fft_rows_mxu(
                    a, self.omega, n, tws, mats=mats))
            self._jit_ifft = jax.jit(
                lambda a, tws, mats: m.fft_rows_mxu(
                    a, self.omega_inv, n, tws, const_scale=self.n_inv,
                    mats=mats))
            self._jit_coset_fft = jax.jit(
                lambda a, tws, mats: m.fft_rows_mxu(
                    a, self.omega, n, tws, col_scale=self.gen,
                    mats=mats))
            self._jit_icoset_fft = jax.jit(
                lambda a, tws, mats: m.fft_rows_mxu(
                    a, self.omega_inv, n, tws, row_scale=self.gen_inv,
                    const_scale=self.n_inv, mats=mats))
            return

        self._jit_fft = jax.jit(lambda a: self._fft(a, self.omega))
        self._jit_ifft = jax.jit(
            lambda a: F.mont_mul(
                FR, self._fft(a, self.omega_inv),
                F.mont_const(FR, self.n_inv, (1,)),
            )
        )
        self._jit_coset_fft = jax.jit(
            lambda a: self._fft(
                F.mont_mul(FR, a, powers(self.gen, self.n)), self.omega
            )
        )
        self._jit_icoset_fft = jax.jit(
            lambda a: F.mont_mul(
                FR,
                F.mont_mul(
                    FR, self._fft(a, self.omega_inv),
                    F.mont_const(FR, self.n_inv, (1,)),
                ),
                powers(self.gen_inv, self.n),
            )
        )

    def tws_for(self, omega_int: int):
        """Cached per-direction twiddle tables (mxu impl)."""
        hit = self._tws.get(omega_int)
        if hit is None:
            hit = self._tws[omega_int] = self._mxu.make_twiddles(
                self.n, omega_int)
        return hit

    def mats_for(self, omega_int: int, col_scale: int = 1,
                 row_scale: int = 1, const_scale: int = 1):
        """Cached per-variant device DFT matrices (mxu impl)."""
        key = (omega_int, col_scale, row_scale, const_scale)
        hit = self._mats.get(key)
        if hit is None:
            hit = self._mats[key] = self._mxu.make_mats(
                self.n, omega_int, col_scale=col_scale,
                row_scale=row_scale, const_scale=const_scale)
        return hit

    # -- core transform -----------------------------------------------------

    def _fft(self, a, omega_int: int):
        """Decimation-in-time radix-2 over the leading axis of [n, L]."""
        n, L = self.n, FR.n_limbs
        assert a.shape == (n, L), f"expected [{n}, {L}], got {a.shape}"
        # narrow upload dtypes (int16 limbs halve the host->device
        # transfer at 2^23) widen on device
        a = a.astype(jnp.int32)
        a = jnp.take(a, self._bitrev, axis=0)
        pw = powers(omega_int, n // 2)  # omega^j, j < n/2
        for s in range(self.log_n):
            m = 1 << s
            stride = n // (2 * m)
            w = pw[::stride][:m]  # omega_{2m}^j for j < m
            a = a.reshape(n // (2 * m), 2, m, L)
            lo, hi = a[:, 0], a[:, 1]
            t = F.mont_mul(FR, hi, w[None, :, :])
            a = jnp.stack([F.add(FR, lo, t), F.sub(FR, lo, t)], axis=1)
        return a.reshape(n, L)

    def fft(self, a):
        """Coefficients -> evaluations on the subgroup (domain.rs:83)."""
        if self.impl == "mxu":
            return self._jit_fft(a, self.tws_for(self.omega),
                                 self.mats_for(self.omega))
        return self._jit_fft(a)

    def ifft(self, a):
        """Evaluations -> coefficients; scales by 1/n (domain.rs:90-103)."""
        if self.impl == "mxu":
            return self._jit_ifft(
                a, self.tws_for(self.omega_inv),
                self.mats_for(self.omega_inv, const_scale=self.n_inv))
        return self._jit_ifft(a)

    # -- coset machinery (H(x) computation, prover.rs:256-283) --------------

    def distribute_powers(self, a, g_int: int):
        """a[i] *= g^i (domain.rs:105)."""
        return F.mont_mul(FR, a, powers(g_int, self.n))

    def coset_fft(self, a):
        """Evaluate on the coset gH (domain.rs:120)."""
        if self.impl == "mxu":
            return self._jit_coset_fft(
                a, self.tws_for(self.omega),
                self.mats_for(self.omega, col_scale=self.gen))
        return self._jit_coset_fft(a)

    def icoset_fft(self, a):
        """Inverse of coset_fft (domain.rs:126-132)."""
        if self.impl == "mxu":
            return self._jit_icoset_fft(
                a, self.tws_for(self.omega_inv),
                self.mats_for(self.omega_inv, row_scale=self.gen_inv,
                              const_scale=self.n_inv))
        return self._jit_icoset_fft(a)

    def divide_by_z_on_coset(self, a):
        """Divide evaluations on gH by Z(x) = x^n - 1 (domain.rs:146).

        On the coset, Z(g*omega^i) = g^n - 1 is the same constant for all i.
        """
        z_inv = modinv((pow(self.gen, self.n, R) - 1) % R, R)
        return F.mont_mul(FR, a, F.mont_const(FR, z_inv, (1,)))

    # -- pointwise helpers (domain.rs:162-189) ------------------------------

    @staticmethod
    def mul_assign(a, b):
        return F.mont_mul(FR, a, b)

    @staticmethod
    def sub_assign(a, b):
        return F.sub(FR, a, b)

    # -- host conversions ---------------------------------------------------

    def from_ints(self, xs):
        """Pad python-int coefficients with zeros to n, Montgomery limbs."""
        assert len(xs) <= self.n
        xs = list(xs) + [0] * (self.n - len(xs))
        return jnp.asarray(F.batch_to_limbs(FR, xs))

    @staticmethod
    def to_ints(a):
        return F.batch_from_limbs(FR, a)
