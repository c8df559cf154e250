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


# ---------------------------------------------------------------------------
# Transposed-limb four-step NTT.
#
# The limb-last [n, L] butterflies above put L = 24 limbs on the TPU's
# 128-wide lane axis — ~5x lane waste, and exactly the measured gap between
# the NTT's ~4-8% of peak and the field-mul ceiling (PERF.md).  This
# variant keeps arrays [L, n1, n2] (limbs leading, as in ops.field_t):
# column FFTs batch over the n2 lane axis, row FFTs over n1, every
# reshape touches only major axes (free), and the single axis swap in the
# middle is the four-step transpose.  Same decomposition as the mesh
# version (parallel.mesh.sharded_ntt) run on one device.
# ---------------------------------------------------------------------------

from . import field_t as FT  # noqa: E402  (after F import by design)


def const_t(int_val: int, cols: int = 1):
    """Montgomery-form constant as a transposed [L, cols] device array."""
    from ..utils.limbs import int_to_limbs

    digits = int_to_limbs(int_val * FR.r % FR.modulus, FR.n_limbs)
    col = np.asarray(digits, dtype=np.int32)[:, None]
    return jnp.asarray(np.repeat(col, cols, axis=1))


def _fft_axis1(x, omega_int: int, nlen: int, bitrev, pw_t):
    """Radix-2 DIT along axis 1 of [L, nlen, B] (transposed limbs).

    ``bitrev``: [nlen] int32 gather indices; ``pw_t``: [L, nlen//2]
    transposed twiddle powers omega^j.
    """
    L = FR.n_limbs
    B = x.shape[2]
    log_n = nlen.bit_length() - 1
    x = jnp.take(x, bitrev, axis=1)
    for s in range(log_n):
        m = 1 << s
        stride = nlen // (2 * m)
        w = pw_t[:, ::stride][:, :m]  # [L, m]
        x = x.reshape(L, nlen // (2 * m), 2, m, B)
        lo, hi = x[:, :, 0], x[:, :, 1]
        t = FT.mont_mul(FR, hi, w[:, None, :, None])
        x = jnp.stack([FT.add(FR, lo, t), FT.sub(FR, lo, t)], axis=2)
    return x.reshape(L, nlen, B)


class DomainT:
    """Four-step transposed-limb NTT of size n = n1 * n2.

    Operates on [L, n] Montgomery arrays (limbs leading).  Bit-exact to
    ``Domain`` (tested) — same math, lane-friendly layout.
    """

    _cache: dict = {}

    def __new__(cls, n: int):
        hit = cls._cache.get(n)
        if hit is None:
            hit = super().__new__(cls)
            hit._init(n)
            cls._cache[n] = hit
        return hit

    def _init(self, n: int):
        assert n & (n - 1) == 0 and n >= 4
        self.n = n
        self.log_n = n.bit_length() - 1
        l1 = self.log_n // 2
        self.n1 = 1 << l1
        self.n2 = n // self.n1
        self.omega = pow(FR_ROOT_OF_UNITY,
                         1 << (FR_TWO_ADICITY - self.log_n), R)
        self.omega_inv = modinv(self.omega, R)
        self.n_inv = modinv(n, R)
        self._rev1 = jnp.asarray(_bitrev_indices(self.n1))
        self._rev2 = jnp.asarray(_bitrev_indices(self.n2))

    def _tables(self, omega_int: int):
        """(pw1_t, pw2_t, tw_t) device twiddle tables for one direction."""
        omega1 = pow(omega_int, self.n2, R)
        omega2 = pow(omega_int, self.n1, R)
        pw1 = jnp.swapaxes(powers(omega1, max(self.n1 // 2, 1)), 0, 1)
        pw2 = jnp.swapaxes(powers(omega2, max(self.n2 // 2, 1)), 0, 1)
        # inter-stage twiddle omega^(k1*j2) as [L, n1, n2]: gather from the
        # full power table (exponents < n) then transpose limbs leading
        e = (np.arange(self.n1, dtype=np.int64)[:, None]
             * np.arange(self.n2, dtype=np.int64)[None, :]) % self.n
        pw = powers(omega_int, self.n)  # [n, L]
        tw = jnp.take(pw, jnp.asarray(e.reshape(-1), dtype=jnp.int32),
                      axis=0).reshape(self.n1, self.n2, FR.n_limbs)
        tw = jnp.transpose(tw, (2, 0, 1))
        return pw1, pw2, tw

    def fft_t(self, x, inverse: bool = False):
        """[L, n] Montgomery -> [L, n] NTT (natural order both sides)."""
        L = FR.n_limbs
        omega = self.omega_inv if inverse else self.omega
        pw1, pw2, tw = self._tables(omega)
        a = x.reshape(L, self.n1, self.n2)
        # 1) column FFTs over j1 (axis 1), lanes = n2
        y = _fft_axis1(a, 0, self.n1, self._rev1, pw1)
        # 2) twiddle
        y = FT.mont_mul(FR, y, tw)
        # 3) transpose (the four-step exchange)
        y = jnp.swapaxes(y, 1, 2)  # [L, n2(j2), n1(k1)]
        # 4) row FFTs over j2 (axis 1), lanes = n1
        z = _fft_axis1(y, 0, self.n2, self._rev2, pw2)
        # z[:, k2, k1]: X[k1 + n1*k2] -> row-major flatten is k2-major
        out = z.reshape(L, self.n)
        if inverse:
            out = FT.mont_mul(FR, out, const_t(self.n_inv))
        return out


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
