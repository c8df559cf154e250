"""Proving-system engines: the pluggable crypto backend for Groth16.

Mirrors the reference's ``Engine`` trait split (``pairing/src/lib.rs:34``):
the Groth16 generator/prover/verifier are generic over an engine that
provides the scalar field, G1/G2 groups, MSM, fixed-base exponentiation, an
FFT domain and a pairing.

Two engines:

  * ``BlsEngine`` — the production BLS12-381 engine.  Heavy lifting (MSM,
    NTT, batched fixed-base) runs on TPU through ``ops.*``; single-point
    group algebra and the verifier pairing run host-side as python ints
    (``oracle.curve`` / ``oracle.pairing``), exactly the reference's split
    where the pairing never left the CPU.
  * ``DummyEngine`` — GF(64513) mock where G1 = G2 = GT = the scalar field
    and the pairing is multiplication, the re-design of
    ``groth16/tests/dummy_engine.rs:20-60``: it makes CRS contents and
    proof algebra directly inspectable by tests.

Points at this interface are python ints: G1 affine = (x, y) or None;
G2 affine = ((x0,x1), (y0,y1)) or None; Dummy group elements are ints.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import R as FR_MOD
from ..constants import modinv
from ..oracle import curve as ocurve
from ..oracle import pairing as opairing


def _make_digits_impl(scal, n_pad: int, c: int):
    from ..ops import msm as M

    # int16 uploads (half the tunnel bytes) widen here: the digit
    # stitching shifts limbs left by up to 11 bits (> int16 headroom)
    scal = scal.astype(jnp.int32)
    scal = jnp.pad(scal, ((0, n_pad - scal.shape[0]), (0, 0)))
    return M.recode_signed_dev(M.digits_from_canonical(scal, c), c)


def _make_digits_idx_impl(scal, idx, n_pad: int, c: int):
    import jax.numpy as jnp2

    return _make_digits_impl(jnp2.take(scal, idx, axis=0), n_pad, c)


_make_digits = None  # lazily jitted below to keep import light
_make_digits_idx = None


def _get_make_digits():
    global _make_digits
    if _make_digits is None:
        import jax

        _make_digits = jax.jit(_make_digits_impl, static_argnums=(1, 2))
    return _make_digits


def _get_make_digits_idx():
    global _make_digits_idx
    if _make_digits_idx is None:
        import jax

        _make_digits_idx = jax.jit(_make_digits_idx_impl,
                                   static_argnums=(2, 3))
    return _make_digits_idx


class _BlsDomain:
    """Python-int facade over the device NTT domain (ops.ntt.Domain)."""

    def __init__(self, n: int):
        import jax

        from ..ops.ntt import Domain

        self.d = Domain(n)
        self.n = n
        if self.d.impl == "mxu":
            self._jit_h = jax.jit(
                lambda a, b, c, tabs: self._h_impl_mxu(
                    a, b, c, tabs, mont_in=True))
            self._jit_h_canon_mxu = jax.jit(
                lambda a, b, c, tabs: self._h_impl_mxu(
                    a, b, c, tabs, mont_in=False))
        else:
            self._jit_h = jax.jit(self._h_impl)
        self._jit_h_canon = None
        self._jit_h_sharded = None

    def _mxu_tables(self, mont_in: bool):
        """Device twiddle + matrix tables for the H(x) chain, as jit
        ARGUMENTS (embedding the ~38 MB matrices as jit constants blows
        the remote-compile payload limit)."""
        from ..constants import modinv
        from ..ops.ntt import FR

        d = self.d
        z_inv = modinv((pow(d.gen, self.n, FR.modulus) - 1) % FR.modulus,
                       FR.modulus)
        final_const = z_inv * d.n_inv % FR.modulus
        if mont_in:
            final_const = final_const * modinv(FR.r, FR.modulus) \
                % FR.modulus
        b_const = 1 if mont_in else FR.r
        return (
            d.tws_for(d.omega),
            d.tws_for(d.omega_inv),
            d.mats_for(d.omega_inv, const_scale=d.n_inv),  # ifft
            d.mats_for(d.omega, col_scale=d.gen),          # coset a/c
            d.mats_for(d.omega, col_scale=d.gen,           # coset b
                       const_scale=b_const),
            d.mats_for(d.omega_inv, row_scale=d.gen_inv,   # final ifft
                       const_scale=final_const),
        )

    def _h_impl_mxu(self, a_in, b_in, c_in, tabs, mont_in: bool):
        """H(x) via the MXU matmul NTT (ops.ntt_mxu): 7 transforms + ONE
        pointwise kernel.  Every constant scaling — 1/n, the coset
        generator powers (distribute_powers), z_inv, the Montgomery-form
        boundary — is folded into the host-side DFT matrices at zero
        runtime cost:

          * the chain runs on CANONICAL-form values end-to-end (inputs
            are canonical limbs straight from the witness pack; with
            mont_in=True an R^-1 is folded into the final transform
            instead — either way there is NO to_mont/from_mont pass);
          * the a*b-c product stage needs one Montgomery bias R, folded
            into b's coset-transform matrices (mont_mul(A, B*R) = A*B).

        Mirrors prover.rs:256-283; output = canonical standard-form
        H(x) digit rows with the top coefficient zeroed (the reference's
        truncate)."""
        from ..ops import ntt_mxu as NM
        from ..ops.ntt import FR

        import jax.numpy as jnp2

        d = self.d
        n = self.n
        tws_f, tws_i, m_ifft, m_coset, m_coset_b, m_final = tabs

        def t(x):
            return jnp2.swapaxes(x.astype(jnp2.int32), 0, 1)

        def ifft_t(x):
            return NM.fft_t_mxu(x, d.omega_inv, n, tws_i, mats=m_ifft)

        def coset_t(x, mats):
            return NM.fft_t_mxu(x, d.omega, n, tws_f, mats=mats)

        # Form ledger at the product stage: with a/b/c carrying form
        # factors (alpha, beta, gamma), mont_mul(A, B) - C is consistent
        # iff alpha*beta/R == gamma.  Canonical inputs (1, 1, 1) need an
        # R bias folded into b's coset matrices; Montgomery inputs
        # (R, R, R) are already consistent and leave one net R on the
        # output, cancelled in the final transform's constant (both
        # handled by _mxu_tables).
        a = coset_t(ifft_t(t(a_in)), m_coset)
        b = coset_t(ifft_t(t(b_in)), m_coset_b)
        c = coset_t(ifft_t(t(c_in)), m_coset)
        ab = NM.mulsub_rows(a, b, c)  # A*B - C
        h = NM.fft_t_mxu(ab, d.omega_inv, n, tws_i, mats=m_final)
        # exact canonical digits: the transform's REDC leaves lazy limbs
        # (value < p(1+2^-11), limbs <= 2^12+2) but the MSM digit
        # decomposition reads raw 12-bit digits — same boundary the bfly
        # path crosses via from_mont's weak canon
        from ..ops import field as F2

        h = F2.canon(FR, jnp2.swapaxes(h, 0, 1), weak=True)
        return h.at[-1].set(0)

    def _h_impl(self, a_mont, b_mont, c_mont):
        """Single traced graph for the whole H(x) block — one device
        dispatch per proof (the tunnel makes per-op dispatch a dominant
        cost, so the 9 stages fuse into one executable)."""
        from ..constants import modinv
        from ..ops import field as F
        from ..ops import ntt as N
        from ..ops.ntt import FR

        d = self.d

        def ifft(x):
            return F.mont_mul(
                FR, d._fft(x, d.omega_inv), F.mont_const(FR, d.n_inv, (1,))
            )

        def coset_fft(x):
            return d._fft(F.mont_mul(FR, x, N.powers(d.gen, d.n)), d.omega)

        a = coset_fft(ifft(a_mont))
        b = coset_fft(ifft(b_mont))
        c = coset_fft(ifft(c_mont))
        ab = F.mont_mul(FR, a, b)
        ab = F.sub(FR, ab, c)
        z_inv = modinv((pow(d.gen, d.n, FR.modulus) - 1) % FR.modulus,
                       FR.modulus)
        ab = F.mont_mul(FR, ab, F.mont_const(FR, z_inv, (1,)))
        h = F.mont_mul(
            FR,
            F.mont_mul(FR, d._fft(ab, d.omega_inv),
                       F.mont_const(FR, d.n_inv, (1,))),
            N.powers(d.gen_inv, d.n),
        )
        h = F.from_mont(FR, h)
        return h.at[-1].set(0)

    def ifft(self, xs):
        return self.d.to_ints(self.d.ifft(self.d.from_ints(xs)))

    def coset_fft(self, xs):
        return self.d.to_ints(self.d.coset_fft(self.d.from_ints(xs)))

    def icoset_fft(self, xs):
        return self.d.to_ints(self.d.icoset_fft(self.d.from_ints(xs)))

    def h_poly_dev(self, a_mont, b_mont, c_mont):
        """The full H(x) block of create_proof (prover.rs:256-283) on
        device: Montgomery-form [n, L] evaluation vectors in, *canonical
        standard-form* coefficient digits [n, L] out — ready for the MSM
        digit decomposition with no host round trip.  The top coefficient
        (dropped by the reference's truncate) is zeroed.

        With ZKTPU_MESH=N the NTT chain runs mesh-distributed (four-step
        with all_to_all transposes, parallel.mesh.h_poly_sharded)."""
        from ..config import mesh_devices

        mesh_n = mesh_devices()
        if mesh_n > 1:
            import jax

            from ..config import ntt_impl
            from ..parallel import mesh as pm

            if self._jit_h_sharded is None:
                mesh = BlsEngine._mesh(mesh_n)
                # mesh NTT tables ride as jit ARGUMENTS (same ~38 MB
                # payload constraint as the single-chip _mxu_tables)
                self._mesh_tabs = (pm.h_poly_tables(self.n, mesh)
                                   if ntt_impl() == "mxu" else None)
                self._jit_h_sharded = jax.jit(
                    lambda a, b, c, tabs: pm.h_poly_sharded(
                        self.n, a, b, c, mesh, tabs=tabs)
                )
            return self._jit_h_sharded(a_mont, b_mont, c_mont,
                                       self._mesh_tabs)
        if self.d.impl == "mxu":
            return self._jit_h(a_mont, b_mont, c_mont,
                               self._mxu_tables(mont_in=True))
        return self._jit_h(a_mont, b_mont, c_mont)

    def h_poly_dev_canon(self, a, b, c):
        """``h_poly_dev`` taking CANONICAL standard-form limb arrays.

        The prover packs its a/b/c evaluation vectors with the vectorized
        bytes+numpy repack (utils.limbs.ints_to_limbs_fast) — no per-int
        Montgomery host math, no device round trip for the R-multiply;
        the to-Montgomery scaling is three extra pointwise mont_muls
        fused into the H(x) executable."""
        from ..config import mesh_devices

        from ..ops import field as F
        from ..ops.ntt import FR

        def conv(x):
            return F.to_mont(FR, x.astype(jnp.int32))

        if mesh_devices() > 1:
            return self.h_poly_dev(*(conv(v) for v in (a, b, c)))
        if self.d.impl == "mxu":
            # canonical end-to-end: no to_mont pass at all (the R
            # bookkeeping is folded into the DFT matrices)
            return self._jit_h_canon_mxu(a, b, c,
                                         self._mxu_tables(mont_in=False))
        if self._jit_h_canon is None:
            import jax

            self._jit_h_canon = jax.jit(
                lambda a, b, c: self._h_impl(conv(a), conv(b), conv(c))
            )
        return self._jit_h_canon(a, b, c)

    def from_ints_mont(self, xs):
        """Python-int evaluation vector -> device Montgomery [n, L]."""
        return self.d.from_ints(xs)

    def h_poly(self, a_vals, b_vals, c_vals):
        """Python-int facade over ``h_poly_dev`` (legacy/test path)."""
        from ..ops import field as F
        from ..ops.ntt import FR

        h = self.h_poly_dev(
            self.d.from_ints(a_vals),
            self.d.from_ints(b_vals),
            self.d.from_ints(c_vals),
        )
        return F.batch_from_limbs(FR, h, mont=False)[: self.n - 1]


class BlsEngine:
    name = "bls12_381"
    r = FR_MOD

    # -- domains ------------------------------------------------------------

    # Domain cache: a _BlsDomain owns the jitted H(x) executable for its
    # size; re-creating it per create_proof would re-trace the whole
    # 7-NTT graph every proof (~30 s at 2^17 even with the persistent
    # XLA cache warm).  One instance per size keeps proofs after the
    # first at pure device-execution cost.
    _domain_cache: dict = {}

    def domain(self, n: int) -> _BlsDomain:
        hit = BlsEngine._domain_cache.get(n)
        if hit is None:
            hit = BlsEngine._domain_cache[n] = _BlsDomain(n)
        return hit

    # -- group algebra (host, python ints) ----------------------------------

    def g1_add(self, a, b):
        return ocurve.g1_add(a, b)

    def g1_mul(self, a, k):
        """Host single-point mul: the native C++ double-and-add when the
        library is built (~0.3 ms), else wNAF w=5 over python ints
        (wnaf.rs wnaf_exp; ~300 EC ops at ~120 us each).  The blinding
        algebra's variable-base muls (s*g_a, r*g_b1) are on the
        warm-proof path (prover.rs:326-354)."""
        k = k % FR_MOD
        if a is None or k == 0:
            return None
        from .. import native as NV

        if NV.available():
            return NV.g1_mul(a, k)
        from ..utils.wnaf import wnaf_exp

        return wnaf_exp(ocurve.g1_add, self.g1_neg, None, a, k, window=5)

    # Host comb tables for FIXED single points (the CRS deltas: three
    # g1 muls + one g2 mul of the blinding algebra are against per-CRS
    # constants).  c=4 comb: 64 windows x 15 odd rows, ~0.1 s one-time
    # build per base, then ~64 adds (~7 ms) per mul instead of a ~40 ms
    # double-and-add chain.  The reference's analog is the shared wNAF
    # window table (wnaf.rs:75).
    _host_fb: dict = {}
    _host_fb_c = 4

    def _host_fixed_mul(self, add, tag, base, k):
        k = int(k) % FR_MOD
        if base is None or k == 0:
            return None
        key = (tag, base)
        tab = BlsEngine._host_fb.get(key)
        if tab is None:
            c = self._host_fb_c
            w_count = -(-256 // c)
            tab = []
            b = base
            for _ in range(w_count):
                row = [None]
                acc = None
                for _ in range(1, 1 << c):
                    acc = add(acc, b)
                    row.append(acc)
                tab.append(row)
                for _ in range(c):
                    b = add(b, b)
            BlsEngine._host_fb[key] = tab
        c = self._host_fb_c
        mask = (1 << c) - 1
        acc, w = None, 0
        while k:
            d = k & mask
            if d:
                acc = add(acc, tab[w][d])
            k >>= c
            w += 1
        return acc

    def g1_mul_fixed(self, base, k):
        from .. import native as NV

        if NV.available():  # native mul beats the host comb walk too
            return NV.g1_mul(base, int(k) % FR_MOD) if base is not None \
                else None
        return self._host_fixed_mul(ocurve.g1_add, "g1", base, k)

    def g2_mul_fixed(self, base, k):
        from .. import native as NV

        if NV.available():
            return NV.g2_mul(base, int(k) % FR_MOD) if base is not None \
                else None
        return self._host_fixed_mul(ocurve.g2_add, "g2", base, k)

    def g1_neg(self, a):
        return None if a is None else (a[0], (-a[1]) % ocurve.Q)

    def g2_add(self, a, b):
        return ocurve.g2_add(a, b)

    def g2_mul(self, a, k):
        from .. import native as NV

        if NV.available():
            return NV.g2_mul(a, k % FR_MOD)
        return ocurve.g2_mul(a, k % FR_MOD)

    def g2_neg(self, a):
        if a is None:
            return None
        return (a[0], tuple((-c) % ocurve.Q for c in a[1]))

    g1_gen = ocurve.G1_GEN
    g2_gen = ocurve.G2_GEN

    # -- bulk device ops ----------------------------------------------------

    # Tuning: smaller chunk counts keep the device graphs small for the
    # CPU test backend; the TPU bench overrides via msm_host directly.
    msm_chunks = 8
    msm_k_inner = 4
    _cache_threshold = 4096  # below this, convert per call (tests, toys)

    @staticmethod
    def _c_for(group_name: str) -> int:
        """Window width: G1 follows ZKTPU_MSM_C (c=6 is the measured
        optimum of madd work ~w_count vs one-hot scatter ~2^(c-1)*w_count
        on v5e); G2 follows ZKTPU_G2_C."""
        if group_name != "g1":
            from ..config import g2_c

            return g2_c()
        from ..config import msm_config

        return msm_config().c

    # Device-form CRS base cache: id(bases list) -> (bases, affine pytree,
    # n_pad).  The proving parameters are long-lived (installed once via
    # librustzcash_init_zksnark_params), while msm_g1/msm_g2 are called
    # once per proof — caching the converted, padded, uploaded arrays
    # removes the dominant host->device transfer from every proof after
    # the first.  Strong refs to the lists guard against id() reuse.
    _base_cache: dict = {}

    def _cached_affine(self, bases, from_ints, floor: int = 1,
                       compact: bool = False, quantum: int = 0):
        """Device-form (affine pytree, n_pad, nz_idx) for a CRS base list.

        With ``compact=True``, identity bases are dropped when that lands
        the padded size on a smaller power of two — the static analog of
        the reference's ``DensityTracker`` (multiexp.rs:99-138): bellman's
        b_g1/b_g2 vectors are ~38% dense for Sapling Spend, and identity
        bases contribute nothing for any scalar, so the kernel lane count
        halves.  ``nz_idx`` (device int32 [n_nz] or None) tells the caller
        which scalar rows to gather; it is None when no compaction
        happened (scalars align 1:1 with the padded bases)."""
        key = (id(bases), from_ints.__name__, compact, quantum)
        hit = BlsEngine._base_cache.get(key)
        if hit is not None and hit[0] is bases:
            return hit[1], hit[2], hit[3]

        def pad_to(n):
            n = max(n, 1)
            if quantum:
                # exact-size mode: the bucket kernel internally pads the
                # stream to a multiple of chunks*k_inner points, so MSMs
                # run at their true size (the 2^17 Spend h vs the 85k `a`
                # vector differ 1.5x in kernel time); one compile per
                # distinct quantized size per circuit, cached persistently
                return max(-(-n // quantum) * quantum, floor)
            return max(1 << (n - 1).bit_length(), floor)

        n_pad = pad_to(len(bases))
        nz_idx = None
        use = list(bases)
        if compact:
            nz = [i for i, b in enumerate(bases) if b is not None]
            n_pad_c = pad_to(len(nz))
            if n_pad_c < n_pad:
                use = [bases[i] for i in nz]
                n_pad = n_pad_c
                nz_idx = jnp.asarray(nz, dtype=jnp.int32)
        use_padded = use + [None] * (n_pad - len(use))
        aff = from_ints(use_padded)
        # use_padded is kept for the hybrid window split's host stage
        # (row order must match the device digit plane)
        BlsEngine._base_cache[key] = (bases, aff, n_pad, nz_idx, use_padded)
        return aff, n_pad, nz_idx

    @classmethod
    def clear_base_cache(cls):
        cls._base_cache.clear()

    _mesh_cache: dict = {}

    @staticmethod
    def _mesh(n: int):
        hit = BlsEngine._mesh_cache.get(n)
        if hit is None:
            from ..parallel import mesh as pm

            hit = BlsEngine._mesh_cache[n] = pm.default_mesh(n)
        return hit

    @staticmethod
    def _compact_pad(bases, scalars):
        """Drop zero-scalar terms and pad to the next power of two.

        The density role of the reference's ``DensityTracker``
        (multiexp.rs:99-138): the b/aux MSMs see large zero stretches, so
        compaction cuts both host->device transfer and bucket work.  The
        power-of-two padding canonicalizes the MSM input shape, so every
        circuit (and every proof) reuses the same compiled executable per
        size class — the per-shape XLA compile is the dominant one-time
        cost on TPU.  Padding uses identity points with zero scalars,
        which the digit-0 bucket skip ignores bit-exactly.
        """
        nz = [i for i, s in enumerate(scalars) if s != 0]
        if len(nz) != len(scalars):
            bases = [bases[i] for i in nz]
            scalars = [scalars[i] for i in nz]
        n = max(len(bases), 1)
        n_pad = 1 << (n - 1).bit_length()
        return (list(bases) + [None] * (n_pad - len(bases)),
                list(scalars) + [0] * (n_pad - len(scalars)))

    # -- device-scalar MSM path ---------------------------------------------

    supports_device_scalars = True

    # digits cache: same assignment vector drives the a / b_g1 / b_g2 MSMs
    # (prover.rs:302-318); computing the signed digit planes once per
    # (array, pad) pair saves two device passes per proof.  Strong refs
    # guard id() reuse; FIFO-capped.
    _digits_cache: dict = {}

    @staticmethod
    def _digits_for(scal_dev, n_pad: int, c: int = 4, nz_idx=None):
        key = (id(scal_dev), n_pad, c,
               None if nz_idx is None else id(nz_idx))
        hit = BlsEngine._digits_cache.get(key)
        if hit is not None and hit[0] is scal_dev:
            return hit[1]
        if nz_idx is None:
            digits = _get_make_digits()(scal_dev, n_pad, c)
        else:
            digits = _get_make_digits_idx()(scal_dev, nz_idx, n_pad, c)
        if len(BlsEngine._digits_cache) > 8:
            BlsEngine._digits_cache.pop(next(iter(BlsEngine._digits_cache)))
        BlsEngine._digits_cache[key] = (scal_dev, digits)
        return digits

    def _msm_dev(self, group_name, bases, scal_dev):
        """MSM with device-resident scalars: [n, L_fr] *canonical
        standard-form* 12-bit digit array (e.g. straight out of
        ``h_poly_dev``), n <= len(bases) + 1.  No host round trip between
        the scalar producer and the bucket kernel."""
        from ..config import (g2_msm_impl, g2_pad_floor, g2_pallas_params,
                              msm_config)
        from ..ops import curve as cv
        from ..ops import msm as M

        from ..config import mesh_devices

        from_ints = (cv.g1_affine_from_ints if group_name == "g1"
                     else cv.g2_affine_from_ints)
        group = cv.G1 if group_name == "g1" else cv.G2
        impl = (msm_config().impl if group_name == "g1" else g2_msm_impl())
        floor = (g2_pad_floor()
                 if group_name == "g2" and impl == "pallas" else 1)
        quantum = 128 if impl == "pallas" and group_name == "g1" else 0
        c = self._c_for(group_name)
        aff, n_pad, nz_idx = self._cached_affine(
            bases, from_ints, floor,
            compact=scal_dev.shape[0] >= len(bases), quantum=quantum)
        assert nz_idx is not None or scal_dev.shape[0] <= n_pad, (
            scal_dev.shape, n_pad)
        digits = self._digits_for(scal_dev, n_pad, c, nz_idx=nz_idx)
        mesh_n = mesh_devices()
        if mesh_n > 1 and n_pad % mesh_n == 0:
            from ..parallel import mesh as pm

            mesh = self._mesh(mesh_n)
            cfg = msm_config()
            if impl == "pallas":
                sl = g2_pad_floor() if group_name == "g2" else (1 << 20)
                parts = pm.sharded_msm_packed(
                    group, aff, digits, mesh, c,
                    max(cfg.chunks // mesh_n, 1), cfg.k_inner, slice_n=sl)
                return pm.packed_parts_to_int(group, parts, group_name)
            return pm.sharded_msm_host(
                group, aff, digits, mesh, c,
                max(cfg.chunks // mesh_n, 1), cfg.k_inner,
                signed=True, impl=impl,
            )
        if impl == "pallas":
            from ..ops import msm_pallas as MP

            ck = (16, 8) if group_name == "g1" else g2_pallas_params()
            # above the slice floor, sweep fixed-size kernel passes so one
            # compiled executable serves every circuit size (the G2 Mosaic
            # compile is the costly one; G1 slices at 2^20 bound HBM)
            sl = g2_pad_floor() if group_name == "g2" else (1 << 20)
            # device-side window combine: readback is ONE projective point
            # instead of [W] sums + a python-int ladder (~0.24 s/MSM saved)
            return MP.msm_host_pallas_fused(group, aff, digits, c, *ck,
                                            slice_n=sl)
        if group_name == "g2" and msm_config().impl == "pallas":
            return M.msm_host(group, aff, digits, c, 128, 8, signed=True)
        return M.msm_host(group, aff, digits, c, self.msm_chunks,
                          self.msm_k_inner, signed=True)

    def _msm_dev_async(self, group_name, bases, scal_dev, host_limbs=None):
        """Dispatch-only MSM: same path as ``_msm_dev`` but the pallas
        result stays a device projective point; returns a zero-arg
        resolver producing the python-int affine.  The prover dispatches
        all five MSMs and resolves after, so the device pipelines the
        bucket sweeps instead of blocking on one readback per MSM
        (the reference enqueues its 8 MSM futures before any .wait(),
        prover.rs:289-353).

        ``host_limbs``: the same scalars as a host [n, 24] 12-bit limb
        array (the prover has it — it built the upload).  When given and
        the hybrid split is on, the top windows run on native host
        threads concurrently with the device sweep of the rest
        (Chapter7.tex:86)."""
        from ..config import g2_msm_impl, mesh_devices, msm_config

        impl = (msm_config().impl if group_name == "g1" else g2_msm_impl())
        mesh_n = mesh_devices()
        if impl != "pallas":
            out = self._msm_dev(group_name, bases, scal_dev)
            return lambda: out

        from ..config import g2_pad_floor, g2_pallas_params, msm_hybrid_c
        from ..ops import curve as cv
        from ..ops import msm_pallas as MP

        from_ints = (cv.g1_affine_from_ints if group_name == "g1"
                     else cv.g2_affine_from_ints)
        group = cv.G1 if group_name == "g1" else cv.G2
        floor = g2_pad_floor() if group_name == "g2" else 1
        quantum = 128 if group_name == "g1" else 0
        # The hybrid split and the pure-device sweep have different
        # measured-optimal G1 window widths (config.msm_hybrid_c); decide
        # hybrid participation before the digit plane is built.
        will_hybrid = False
        if host_limbs is not None:
            from .. import native as NV
            from ..config import msm_hybrid_windows

            will_hybrid = NV.available() and msm_hybrid_windows() != 0
        c = (msm_hybrid_c() if will_hybrid and group_name == "g1"
             else self._c_for(group_name))
        compact = scal_dev.shape[0] >= len(bases)
        aff, n_pad, nz_idx = self._cached_affine(
            bases, from_ints, floor, compact=compact, quantum=quantum)
        assert nz_idx is not None or scal_dev.shape[0] <= n_pad, (
            scal_dev.shape, n_pad)
        digits = self._digits_for(scal_dev, n_pad, c, nz_idx=nz_idx)
        ck = (16, 8) if group_name == "g1" else g2_pallas_params()
        sl = g2_pad_floor() if group_name == "g2" else (1 << 20)
        if group_name == "g2" and n_pad > sl:
            # chained-state G2 sweeps carry the bucket state as a kernel
            # INPUT as well as output+scratch; at c=7 (nb=64) the full
            # 16-chunk lane width exceeds the v5e scoped-vmem budget
            # (raising vmem_limit_bytes doesn't help — Mosaic's demand
            # tracks the budget).  Halve the lanes: same total madd
            # work, the state fits with wide margin.
            ck = (max(ck[0] // 2, 4), ck[1])
        mesh = (self._mesh(mesh_n)
                if mesh_n > 1 and n_pad % mesh_n == 0 else None)

        def dev_sweep(dig):
            """Dispatch the device sweep of `dig`'s windows; returns a
            zero-arg resolver -> python-int affine.  Mesh mode shards the
            point axis and runs the full per-shard pipeline (slice
            chaining included) — the hybrid split composes identically on
            top of either form.

            The resolver also exposes ``packed_dev`` (the flat device
            result) and ``finish(host_np)`` so the prover can batch all
            five MSMs' readbacks into ONE host<->device round trip —
            each separate ~100-byte readback costs a full tunnel RTT
            (~20-30 ms), a pure-latency tax on the proof."""
            if mesh is not None:
                from ..parallel import mesh as pm

                parts = pm.sharded_msm_packed(
                    group, aff, dig, mesh, c,
                    max(ck[0] // mesh_n, 1), ck[1], slice_n=sl)
                shape = parts.shape

                def finish(arr):
                    import numpy as np

                    return pm.packed_parts_to_int(
                        group, np.asarray(arr).reshape(shape), group_name)

                flat = parts.reshape(-1)
            else:
                packed = MP.msm_device_proj(group, aff, dig, c, *ck,
                                            slice_n=sl)

                def finish(arr):
                    return MP.packed_to_int_point(group, arr)

                flat = packed

            def resolve():
                import numpy as np

                return finish(np.asarray(flat))

            resolve.packed_dev = flat
            resolve.finish = finish
            return resolve

        hw = 0
        if will_hybrid:
            from ..config import msm_hybrid_windows

            hw = msm_hybrid_windows()
        if hw != 0:
            import threading

            import numpy as np

            from ..ops import msm as M2
            from ..ops.msm_hybrid import auto_host_windows
            from ..oracle import curve as O2

            w_count = digits.shape[1]
            # host: top-k windows via the native bucket worker, digit
            # plane rebuilt bit-identically from the host limb array
            # (gathered by the same compaction index, padded the same)
            key = (id(bases), from_ints.__name__, compact, quantum)
            stage = self._hybrid_stage(
                group_name, bases, BlsEngine._base_cache[key][4])
            k = (auto_host_windows(group_name, w_count, stage, c)
                 if hw < 0 else hw)
            k = max(1, min(k, w_count - 1))
            lo_w = w_count - k
            # device: low windows only (on-device digit slice)
            resolve_dev = dev_sweep(digits[:, :lo_w])

            result = {}

            def host_part():
                limbs = np.asarray(host_limbs)
                if nz_idx is not None:
                    limbs = limbs[np.asarray(nz_idx)]
                limbs = limbs[:n_pad]
                if limbs.shape[0] < n_pad:
                    limbs = np.pad(
                        limbs, ((0, n_pad - limbs.shape[0]), (0, 0)))
                dg = M2.recode_signed(
                    M2.digits_from_limbs_np(limbs, c), c).astype(np.int8)
                sums = stage.window_sums(dg, lo_w, w_count, c)
                add = O2.g2_add if group_name == "g2" else O2.g1_add
                hi = None
                for wsum in reversed(sums):
                    for _ in range(c):
                        hi = add(hi, hi)
                    hi = add(hi, wsum)
                result["host"] = hi

            th = threading.Thread(target=host_part)
            th.start()

            def hybrid_finish(arr):
                dev = resolve_dev.finish(arr)
                th.join()
                add = O2.g2_add if group_name == "g2" else O2.g1_add
                mul = self.g2_mul if group_name == "g2" else self.g1_mul
                hi = result["host"]
                if hi is not None:
                    hi = mul(hi, (1 << (c * lo_w)) % O2.R)
                return add(dev, hi)

            def resolve_hybrid():
                return hybrid_finish(np.asarray(resolve_dev.packed_dev))

            resolve_hybrid.packed_dev = resolve_dev.packed_dev
            resolve_hybrid.finish = hybrid_finish
            return resolve_hybrid

        return dev_sweep(digits)

    def msm_g1_async(self, bases, scal_dev, host_limbs=None):
        return self._msm_dev_async("g1", bases, scal_dev, host_limbs)

    def msm_g2_async(self, bases, scal_dev, host_limbs=None):
        return self._msm_dev_async("g2", bases, scal_dev, host_limbs)

    def _msm(self, group_name, bases, scalars):
        import jax.numpy as jnp

        from ..config import msm_config
        from ..ops import curve as cv
        from ..ops import msm as M

        if hasattr(scalars, "shape") and getattr(scalars, "ndim", 0) == 2:
            return self._msm_dev(group_name, bases, scalars)

        from_ints = (cv.g1_affine_from_ints if group_name == "g1"
                     else cv.g2_affine_from_ints)
        group = cv.G1 if group_name == "g1" else cv.G2
        orig_bases = bases  # stage-cache key (compaction rebinds `bases`)
        big_crs = len(bases) >= self._cache_threshold
        if big_crs:
            # big CRS vector: reuse the cached device arrays; density is
            # handled by the digit-0 bucket skip alone.  G2 pads up to one
            # canonical size so every proof shares a single compiled
            # Mosaic executable (config.g2_pad_floor).
            from ..config import g2_msm_impl, g2_pad_floor

            floor = (g2_pad_floor()
                     if group_name == "g2" and g2_msm_impl() == "pallas"
                     else 1)
            quantum = (128 if group_name == "g1"
                       and msm_config().impl == "pallas" else 0)
            aff, n_pad, nz_idx = self._cached_affine(
                bases, from_ints, floor,
                compact=len(scalars) >= len(bases), quantum=quantum)
            if nz_idx is not None:
                import numpy as np

                scalars = [scalars[i] for i in np.asarray(nz_idx)]
                bases = [bases[i] for i in np.asarray(nz_idx)]
            scalars = list(scalars) + [0] * (n_pad - len(scalars))
            # keep the host-side base list row-aligned with the digit
            # array (the hybrid window split accumulates on the host)
            bases = list(bases) + [None] * (n_pad - len(bases))
        else:
            bases, scalars = self._compact_pad(bases, scalars)
            aff = from_ints(bases)
        c = self._c_for(group_name)
        digits_np = M.recode_signed(M.digits_from_ints(scalars, c), c)
        digits = jnp.asarray(digits_np)
        from ..config import g2_msm_impl, g2_pallas_params

        impl = (msm_config().impl if group_name == "g1" else g2_msm_impl())
        if impl == "pallas":
            from ..config import g2_pad_floor, msm_hybrid_windows
            from ..ops import msm_pallas as MP

            ck = (16, 8) if group_name == "g1" else g2_pallas_params()
            sl = g2_pad_floor() if group_name == "g2" else (1 << 20)
            hw = msm_hybrid_windows()
            # hybrid only for cached CRS vectors: the compacted+padded
            # base list is deterministic per CRS vector there, so the
            # native stage (a ~0.6 s Montgomery conversion) caches keyed
            # by the original list; per-call staging would eat the win
            if hw != 0 and big_crs:
                from ..ops.msm_hybrid import msm_hybrid

                return msm_hybrid(group, group_name, bases, aff, digits_np,
                                  c, *ck, host_windows=hw, slice_n=sl,
                                  stage=self._hybrid_stage(group_name,
                                                           orig_bases,
                                                           bases),
                                  digits_dev=digits)
            return MP.msm_host_pallas_fused(group, aff, digits, c, *ck,
                                            slice_n=sl)
        if group_name == "g2" and msm_config().impl == "pallas":
            # XLA G2 fallback sized for TPU
            return M.msm_host(group, aff, digits, c, 128, 8, signed=True)
        return M.msm_host(group, aff, digits, c, self.msm_chunks,
                          self.msm_k_inner, signed=True)

    # native host-worker stages for the hybrid window split, cached like
    # the device-form base cache (staging = one-time Montgomery convert)
    _stage_cache: dict = {}

    def _hybrid_stage(self, group_name, orig_bases, padded_bases):
        """Stage `padded_bases` (the compacted+padded row order the digit
        array uses), cached by the identity of the original CRS vector —
        the compaction is deterministic given that vector."""
        from ..ops.msm_hybrid import make_stage

        key = (id(orig_bases), group_name, len(padded_bases))
        hit = BlsEngine._stage_cache.get(key)
        if hit is not None and hit[0] is orig_bases:
            return hit[1]
        stage = make_stage(padded_bases, group_name)
        if len(BlsEngine._stage_cache) > 16:
            BlsEngine._stage_cache.pop(next(iter(BlsEngine._stage_cache)))
        BlsEngine._stage_cache[key] = (orig_bases, stage)
        return stage

    def msm_g1(self, bases, scalars):
        return self._msm("g1", bases, scalars)

    def msm_g2(self, bases, scalars):
        return self._msm("g2", bases, scalars)

    # Fixed-base comb tables: (group name, generator) -> device affine
    # pytree with W*2^c rows (row w*2^c + j = j * 2^(cw) * gen).  The
    # table-walk replaces round 1's 255-step double-and-add scan with
    # W = 32 gathered mixed adds — the role of the reference generator's
    # shared wNAF window tables (pairing/src/wnaf.rs:75, generator.rs).
    _fb_c = 8
    _FB_SLICE = 1 << 17  # max points per fixed-base executable (HBM bound)
    _fb_tables: dict = {}

    def _fb_table(self, group_name, from_ints, gen):
        key = (group_name, gen if group_name == "g1" else gen[0])
        hit = BlsEngine._fb_tables.get(key)
        if hit is not None:
            return hit
        add = (ocurve.g1_add if group_name == "g1" else ocurve.g2_add)
        c, W = self._fb_c, -(-256 // self._fb_c)
        rows = []
        base = gen
        for _ in range(W):
            acc = None
            rows.append(None)  # j = 0 -> identity
            for _ in range(1, 1 << c):
                acc = add(acc, base)
                rows.append(acc)
            for _ in range(c):
                base = add(base, base)  # base <- 2^c * base
        table = from_ints(rows)
        BlsEngine._fb_tables[key] = table
        return table

    def _fixed_base(self, group, from_ints, to_ints, gen, scalars):
        import numpy as np

        import jax

        from ..ops import msm as M

        c = self._fb_c
        n_real = len(scalars)
        # pad to a power of two so CRS base vectors of similar size share
        # one compiled executable (scalar 0 -> identity -> sliced off);
        # above _FB_SLICE, run fixed-size slices through ONE executable —
        # the monolithic 2^21 walk (Sprout CRS) allocates multi-GB of
        # gather intermediates and crashes the TPU worker
        n = 1
        while n < n_real:
            n *= 2
        slice_n = min(n, self._FB_SLICE)
        padded = ([int(k) % FR_MOD for k in scalars]
                  + [0] * (-n_real % slice_n))
        digits = M.digits_from_ints(padded, c)  # [n_padded, W] (multiple of slice_n)
        W = digits.shape[1]
        idx = (digits.T.astype(np.int32)
               + (np.arange(W, dtype=np.int32) * (1 << c))[:, None])  # [W, n]
        table = self._fb_table(group.f.name, from_ints, gen)
        tx, ty, tinf = table

        @jax.jit
        def run(idx):
            def body(acc, idx_w):
                aff = (
                    jax.tree.map(lambda l: jnp.take(l, idx_w, axis=0), tx),
                    jax.tree.map(lambda l: jnp.take(l, idx_w, axis=0), ty),
                    jnp.take(tinf, idx_w, axis=0),
                )
                return group.add_mixed(acc, aff), None

            acc, _ = jax.lax.scan(body, group.identity((slice_n,)), idx)
            return group.to_affine(acc)

        out = []
        for s in range(0, idx.shape[1], slice_n):
            out.extend(to_ints(run(jnp.asarray(idx[:, s:s + slice_n]))))
        return out[:n_real]

    def fixed_base_g1(self, scalars):
        """[k_i * G1] batched on device (generator's wNAF-table analogue,
        pairing/src/wnaf.rs:75 — here a batched double-and-add scan)."""
        from ..ops import curve as cv

        return self._fixed_base(
            cv.G1, cv.g1_affine_from_ints, cv.g1_affine_to_ints,
            self.g1_gen, scalars
        )

    def fixed_base_g2(self, scalars):
        from ..ops import curve as cv

        return self._fixed_base(
            cv.G2, cv.g2_affine_from_ints, cv.g2_affine_to_ints,
            self.g2_gen, scalars
        )

    # -- pairing (host) -----------------------------------------------------

    def pairing(self, p, q):
        return opairing.pairing(p, q)

    def pairing_product(self, pairs):
        return opairing.pairing_product(pairs)

    def gt_one(self):
        return opairing.Fq12.one()

    def gt_mul(self, a, b):
        return a * b

    def gt_eq(self, a, b):
        return a == b


class _DummyDomain:
    """Naive O(n^2) DFT over GF(64513) — the dummy engine's FFT."""

    def __init__(self, n: int, p: int, root: int, two_adicity: int):
        assert n & (n - 1) == 0
        log_n = n.bit_length() - 1
        assert log_n <= two_adicity
        self.n, self.p = n, p
        self.omega = pow(root, 1 << (two_adicity - log_n), p)
        self.gen = 5  # multiplicative generator mod 64513 (checked below)

    def _dft(self, xs, omega):
        p, n = self.p, self.n
        return [
            sum(x * pow(omega, i * j, p) for j, x in enumerate(xs)) % p
            for i in range(n)
        ]

    def _pad(self, xs):
        return list(xs) + [0] * (self.n - len(xs))

    def ifft(self, xs):
        ninv = modinv(self.n, self.p)
        out = self._dft(self._pad(xs), modinv(self.omega, self.p))
        return [x * ninv % self.p for x in out]

    def coset_fft(self, xs):
        xs = self._pad(xs)
        shifted = [x * pow(self.gen, i, self.p) % self.p for i, x in enumerate(xs)]
        return self._dft(shifted, self.omega)

    def icoset_fft(self, xs):
        gi = modinv(self.gen, self.p)
        out = self.ifft(xs)
        return [x * pow(gi, i, self.p) % self.p for i, x in enumerate(out)]

    def h_poly(self, a_vals, b_vals, c_vals):
        p = self.p
        a = self.coset_fft(self.ifft(a_vals))
        b = self.coset_fft(self.ifft(b_vals))
        c = self.coset_fft(self.ifft(c_vals))
        zinv = modinv((pow(self.gen, self.n, p) - 1) % p, p)
        ab = [(x * y - z) * zinv % p for x, y, z in zip(a, b, c)]
        return self.icoset_fft(ab)[: self.n - 1]


class DummyEngine:
    """GF(64513) mock engine (dummy_engine.rs): groups are the scalar field
    written additively in the exponent; pairing(a, b) = a*b."""

    name = "dummy"
    r = 64513
    two_adicity = 10
    # 5 generates GF(64513)^* (64512 = 2^10 * 3^2 * 7; checked in tests)
    root_of_unity = pow(5, 63, 64513)

    g1_gen = 1
    g2_gen = 1

    def domain(self, n: int):
        return _DummyDomain(n, self.r, self.root_of_unity, self.two_adicity)

    def g1_add(self, a, b):
        return ((a or 0) + (b or 0)) % self.r or None

    g2_add = g1_add

    def g1_mul(self, a, k):
        return ((a or 0) * k) % self.r or None

    g2_mul = g1_mul

    def g1_neg(self, a):
        return None if a is None else (-a) % self.r or None

    g2_neg = g1_neg

    def msm_g1(self, bases, scalars):
        acc = 0
        for b, s in zip(bases, scalars):
            acc = (acc + (b or 0) * s) % self.r
        return acc or None

    msm_g2 = msm_g1

    def fixed_base_g1(self, scalars):
        return [s % self.r or None for s in scalars]

    fixed_base_g2 = fixed_base_g1

    def pairing(self, p, q):
        return ((p or 0) * (q or 0)) % self.r

    def pairing_product(self, pairs):
        acc = 0
        for p, q in pairs:
            acc = (acc + (p or 0) * (q or 0)) % self.r
        return acc

    def gt_one(self):
        return 0  # additive exponent representation

    def gt_mul(self, a, b):
        return (a + b) % self.r

    def gt_eq(self, a, b):
        return a == b
