"""FFT over *curve points* — the reference ``Group`` abstraction.

The reference's ``EvaluationDomain`` is generic over a ``Group`` trait
(``bellman/src/domain.rs:192-250``) with two instances: ``Scalar`` (Fr —
the hot Groth16 path, ours lives in ``ops.ntt``) and ``Point<G>``
(projective curve points, where ``group_mul_assign`` is scalar
multiplication, ``domain.rs:199-228``).  This module provides the point
instance: a radix-2 FFT whose butterfly twiddle-multiply is a batched
double-and-add scalar multiplication with *per-element* scalars.

Not on the Groth16 critical path (the prover only FFTs scalars), but part
of the reference's API surface; useful for KZG-style commitment schemes
over Lagrange bases.  O(n log n) point scalar-muls — intended for modest n.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import R, modinv
from .curve import G1, Group
from .ntt import _bitrev_indices, Domain

SCALAR_BITS = 255


def _bits_msb(xs, n_bits: int = SCALAR_BITS) -> np.ndarray:
    """Host ints -> [n_bits, len(xs)] MSB-first bit planes."""
    out = np.zeros((n_bits, len(xs)), np.int32)
    for j, x in enumerate(xs):
        for i in range(n_bits):
            out[n_bits - 1 - i, j] = (x >> i) & 1
    return out


def scalar_mul_vec(group: Group, p, bits):
    """Batched double-and-add with per-element scalars.

    p: projective pytree [n]; bits: [n_bits, n] MSB-first.  The shared-
    scalar variant is ``Group.scalar_mul`` (curve.py); this one lets each
    lane carry its own exponent (the FFT twiddle vector).
    """
    def body(acc, bit):
        acc = group.double(acc)
        withadd = group.add(acc, p)
        acc = group.select(bit != 0, withadd, acc)
        return acc, None

    shape = group.f.batch_shape(p[0])
    acc, _ = jax.lax.scan(body, group.identity(shape), bits)
    return acc


class GroupDomain:
    """Evaluation domain over projective curve points (domain.rs Point<G>).

    Same omega/coset bookkeeping as the scalar ``Domain``; the butterfly
    multiply is ``scalar_mul_vec`` and add/sub are complete projective
    add / add-neg.
    """

    def __init__(self, n: int, group: Group = G1):
        self._d = Domain(n)  # reuse omega / n_inv / bitrev bookkeeping
        self.n = n
        self.log_n = self._d.log_n
        self.group = group
        self._bitrev = jnp.asarray(_bitrev_indices(n))
        self._jit_fft = jax.jit(self._fft_impl)

    def _twiddle_bits(self, omega_int: int):
        """Per-stage [255, m] twiddle bit planes (host, tiny)."""
        n = self.n
        pw = [pow(omega_int, j, R) for j in range(n // 2)]
        stages = []
        for s in range(self.log_n):
            m = 1 << s
            stride = n // (2 * m)
            stages.append(_bits_msb(pw[::stride][:m]))
        return stages

    def _fft_impl(self, pts, stage_bits):
        g, n = self.group, self.n
        pts = tuple(jnp.take(leaf, self._bitrev, axis=0) for leaf in pts)
        for s in range(self.log_n):
            m = 1 << s
            a = tuple(leaf.reshape(n // (2 * m), 2, m, *leaf.shape[1:])
                      for leaf in pts)
            lo = tuple(leaf[:, 0] for leaf in a)
            hi = tuple(leaf[:, 1] for leaf in a)
            t = scalar_mul_vec(g, hi, stage_bits[s][:, None, :])
            plus = g.add(lo, t)
            minus = g.add(lo, g.neg(t))
            pts = tuple(
                jnp.stack([pl, mi], axis=1).reshape(n, *pl.shape[2:])
                for pl, mi in zip(plus, minus)
            )
        return pts

    def fft(self, pts):
        """Point coefficients -> evaluations on the subgroup."""
        return self._jit_fft(pts, self._twiddle_bits(self._d.omega))

    def ifft(self, pts):
        """Evaluations -> point coefficients (scales by 1/n)."""
        out = self._jit_fft(pts, self._twiddle_bits(self._d.omega_inv))
        n_inv_bits = jnp.asarray(_bits_msb([self._d.n_inv] * self.n))
        return scalar_mul_vec(self.group, out, n_inv_bits)
