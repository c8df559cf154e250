"""Groth16 parameter / proof containers.

Re-design of ``bellman/src/groth16/mod.rs``: ``VerifyingKey``
(mod.rs:140-213), ``Parameters`` (mod.rs:216-382) and ``Proof``
(mod.rs:42-98).  Points are python-int affine tuples at this layer (G1 =
(x, y) | None, G2 = ((x0,x1),(y0,y1)) | None); the byte-level codecs live
in ``protocol.codecs``.

Unlike bellman we store the a/b base vectors densely (one slot per
variable, identity for never-used slots) instead of density-compacted —
zero scalars fall out of the MSM digit-0 skip for free, which replaces the
reference's ``DensityTracker`` machinery (multiexp.rs:99-138) at equal
asymptotic cost.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional


@dataclasses.dataclass
class VerifyingKey:
    alpha_g1: Any
    beta_g1: Any
    beta_g2: Any
    gamma_g2: Any
    delta_g1: Any
    delta_g2: Any
    ic: List[Any]  # [(beta u_i + alpha v_i + w_i)/gamma] G1, per input


@dataclasses.dataclass
class Parameters:
    vk: VerifyingKey
    h: List[Any]      # [tau^i Z(tau)/delta] G1, i < m-1
    l: List[Any]      # [(beta u_i + alpha v_i + w_i)/delta] G1, per aux
    a: List[Any]      # [u_i(tau)] G1, all variables (inputs then aux)
    b_g1: List[Any]   # [v_i(tau)] G1
    b_g2: List[Any]   # [v_i(tau)] G2
    num_inputs: int = 0
    num_aux: int = 0


@dataclasses.dataclass
class Proof:
    a: Any  # G1
    b: Any  # G2
    c: Any  # G1


@dataclasses.dataclass
class PreparedVerifyingKey:
    """prepare_verifying_key (verifier.rs:18): precomputed e(alpha, beta),
    negated gamma/delta for the product-of-pairings check."""

    alpha_beta: Any   # GT
    neg_gamma_g2: Any
    neg_delta_g2: Any
    ic: List[Any]
