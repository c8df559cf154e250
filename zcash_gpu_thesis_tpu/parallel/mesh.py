"""Multi-chip execution: mesh-sharded MSM and distributed NTT.

The reference is strictly single-device (one OpenCL queue,
``multiexp.rs:2839``); its only scaling axes are intra-device work-groups
and the thread-pool FFT split (``domain.rs:317-374``).  This module is the
TPU-native scaling layer those map to (SURVEY.md §2.3-2.4):

  * **MSM**: points are sharded across the mesh's data axis; every device
    runs the shard-local Pippenger bucket accumulation (ops.msm.window_sums
    — the analogue of a GPU work-group's private buckets) and the [W]
    window partials are combined across chips.  Window partials are tiny
    (W x 3 coords x 33 limbs), so the collective cost is negligible next
    to the bucket work, exactly like the reference's groups->host
    reduction (multiexp.rs:2946-2986).
  * **NTT**: the four-step decomposition n = n1*n2 — local column FFTs,
    twiddle scaling, a cross-chip transpose (all_to_all over ICI), local
    row FFTs.  This is the reference's parallel_fft decomposition
    (2^k sub-FFTs + twiddle recombination) with the thread pool replaced
    by the mesh and the shared-memory shuffle replaced by all_to_all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import R, modinv
from ..ops import field as F
from ..ops import msm as M
from ..ops import ntt as N
from ..ops.curve import Group

FR = F.FR


def default_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def multihost_mesh(n_hosts: int, chips_per_host: int | None = None) -> Mesh:
    """(hosts x chips) 2D mesh: axis "host" spans DCN, axis "data" spans
    the chips within a host (ICI).  Shard the MSM point stream over the
    compound ("host", "data") axis — window partials are tiny, so the
    cross-host combine is one small DCN collective; shard NTT transposes
    over "data" only when possible so all_to_all rides ICI.

    On a real pod slice call ``init_multihost()`` first so jax.devices()
    spans all processes; under the driver's CPU dryrun this shapes the
    virtual devices identically.
    """
    devs = jax.devices()
    if chips_per_host is None:
        chips_per_host = max(len(devs) // n_hosts, 1)
    devs = devs[: n_hosts * chips_per_host]
    return Mesh(
        np.asarray(devs).reshape(n_hosts, chips_per_host),
        ("host", "data"),
    )


def init_multihost() -> None:
    """Initialize ``jax.distributed`` from ZKTPU_COORD / ZKTPU_NPROC /
    ZKTPU_PROC_ID env vars (coordinator address, process count, this
    process's id).  No-op when unset, so single-process runs and the CPU
    dryrun need no changes; on a real N-host pod slice each host process
    calls this before touching jax.devices()."""
    import os

    coord = os.environ.get("ZKTPU_COORD")
    if not coord:
        return
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["ZKTPU_NPROC"]),
        process_id=int(os.environ["ZKTPU_PROC_ID"]),
    )


def _axis_size(mesh: Mesh, axis) -> int:
    """Total extent of a (possibly compound) mesh axis name."""
    names = (axis,) if isinstance(axis, str) else tuple(axis)
    size = 1
    for nm in names:
        size *= mesh.shape[nm]
    return size


# ---------------------------------------------------------------------------
# Sharded MSM.
# ---------------------------------------------------------------------------


def sharded_msm(group: Group, points, digits, mesh: Mesh, c: int = 4,
                chunks: int = 16, k_inner: int = 8, axis: str = "data",
                signed: bool = False, impl: str = "xla"):
    """MSM with the point axis sharded over `mesh`.

    Each device computes its shard's [W] window partials; the partials are
    all-gathered (W x point-size — bytes, not megabytes) and folded with
    the complete-add tree, then the usual doubling-ladder combine runs
    replicated.
    """

    def local(pts, digs):
        if impl == "pallas":
            from ..ops import msm_pallas as MP

            assert signed, "pallas bucket kernel takes signed digits"
            wsums = MP.window_sums_pallas(group, pts, digs, c, chunks,
                                          k_inner)
        else:
            wsums = M.window_sums(group, pts, digs, c, chunks, k_inner,
                                  signed=signed)
        # add a leading axis of size 1 per device: out spec concatenates
        return jax.tree.map(lambda l: l[None], wsums)

    # The local body returns a *projective* pytree (3 coords), whose
    # structure differs from the affine input pytree (x, y, inf) — for G2
    # the leaf counts differ (6 vs 5), so out_specs must be built from the
    # output structure, not the points.  group.identity(()) has exactly
    # the output's pytree structure.
    out_struct = group.identity(())
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), points), P(axis)),
        out_specs=jax.tree.map(lambda _: P(axis), out_struct),
        check_rep=False,
    )
    parts = fn(points, digits)  # leaves [n_dev, W, ...]

    ndev = _axis_size(mesh, axis)
    total = parts
    while ndev > 1:
        half = ndev // 2
        lo = jax.tree.map(lambda l: l[:half], total)
        hi = jax.tree.map(lambda l: l[half:], total)
        total = group.add(lo, hi)
        ndev = half
    wsums = jax.tree.map(lambda l: l[0], total)
    return M.combine_windows(group, wsums, c)


def sharded_msm_host(group: Group, points, digits, mesh: Mesh, c: int = 4,
                     chunks: int = 16, k_inner: int = 8, axis: str = "data",
                     signed: bool = True, impl: str = "xla"):
    """Engine-facing sharded MSM: device bucket work per shard, window
    partials combined across the mesh, final W-window doubling ladder on
    the host (the reference's groups->host split, multiexp.rs:2968-2986).
    Returns a python-int affine point / None."""
    from ..ops import curve as cv
    from ..ops.msm import _tree_map
    from ..oracle import curve as O

    # reuse sharded_msm's shard-local machinery but stop at window sums
    def local(pts, digs):
        if impl == "pallas":
            from ..ops import msm_pallas as MP

            wsums = MP.window_sums_pallas(group, pts, digs, c, chunks,
                                          k_inner)
        else:
            wsums = M.window_sums(group, pts, digs, c, chunks, k_inner,
                                  signed=signed)
        return jax.tree.map(lambda l: l[None], wsums)

    out_struct = group.identity(())
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), points), P(axis)),
        out_specs=jax.tree.map(lambda _: P(axis), out_struct),
        check_rep=False,
    )
    parts = fn(points, digits)
    ndev = _axis_size(mesh, axis)
    total = parts
    while ndev > 1:
        half = ndev // 2
        lo = jax.tree.map(lambda l: l[:half], total)
        hi = jax.tree.map(lambda l: l[half:], total)
        total = group.add(lo, hi)
        ndev = half
    wsums_proj = jax.tree.map(lambda l: l[0], total)
    aff = group.to_affine(wsums_proj)
    if group is cv.G1:
        wsums = cv.g1_affine_to_ints(aff)
        add = O.g1_add
    else:
        wsums = cv.g2_affine_to_ints(aff)
        add = O.g2_add
    acc = None
    for wsum in reversed(wsums):
        for _ in range(c):
            acc = add(acc, acc)
        acc = add(acc, wsum)
    return acc


def sharded_msm_packed(group: Group, points, digits, mesh: Mesh,
                       c: int = 6, chunks: int = 16, k_inner: int = 8,
                       axis: str = "data", slice_n: int = 1 << 20):
    """Point-sharded MSM where every shard runs the COMPLETE device
    pipeline — sliced bucket-state chaining above ``slice_n`` plus the
    in-VMEM suffix/fold/ladder combine — and emits one packed projective
    point; the cross-shard combine is ndev tiny host additions.

    MSM is linear in the point stream, so per-shard full combines are
    exact; vs the [W]-window all-gather form (sharded_msm_host) this
    moves ndev x ~200 bytes instead of ndev x W points and reuses the
    single-chip slice chaining unchanged — mesh mode stops being a
    second-class path.  Returns the [ndev, ...] packed array,
    device-resident (async); resolve with :func:`packed_parts_to_int`.
    """
    from ..ops import msm_pallas as MP

    def local(pts, digs):
        packed = MP.msm_device_proj(group, pts, digs, c, chunks, k_inner,
                                    slice_n)
        return packed[None]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), points), P(axis)),
        out_specs=P(axis),
        check_rep=False,
    )
    return fn(points, digits)


def packed_parts_to_int(group: Group, parts, group_name: str):
    """[ndev, ...] packed shard results -> python-int affine total."""
    from ..ops import msm_pallas as MP
    from ..oracle import curve as O

    add = O.g2_add if group_name == "g2" else O.g1_add
    total = None
    for i in range(parts.shape[0]):
        total = add(total, MP.packed_to_int_point(group, parts[i]))
    return total


def h_poly_tables(n: int, mesh: Mesh, axis: str = "data"):
    """Forward+inverse mesh NTT tables for :func:`h_poly_sharded`'s MXU
    path — build once per (domain, mesh), pass into the jitted chain as
    arguments."""
    ndev = _axis_size(mesh, axis)
    return {
        "fwd": mesh_ntt_tables(n, ndev, inverse=False),
        "inv": mesh_ntt_tables(n, ndev, inverse=True),
    }


def h_poly_sharded(n: int, a, b, c, mesh: Mesh, axis: str = "data",
                   tabs=None):
    """The prover's full H(x) block (prover.rs:256-283) with every NTT as
    a four-step mesh-distributed transform: 3x(iNTT + coset NTT), a*b - c,
    divide-by-Z on the coset, inverse coset NTT.  Elementwise stages are
    plain jnp ops (XLA propagates the sharding); the cross-chip transpose
    inside the sharded NTT rides all_to_all over ICI.

    With ``tabs`` (from :func:`h_poly_tables`) the transforms run as the
    MXU matmul NTT (sharded_ntt_mxu — the mesh form of the single-chip
    default); without, the radix-2 butterfly locals (round-1 form).

    In/out: Montgomery [n, L] arrays; output is *canonical standard-form*
    digits with the dropped top coefficient zeroed, matching
    _BlsDomain.h_poly_dev."""
    from ..constants import FR_GENERATOR
    from ..ops import ntt as N2

    FRs = F.FR
    gen_inv = modinv(FR_GENERATOR, R)

    def ifft(x):
        if tabs is not None:
            return sharded_ntt_mxu(n, x, mesh, tabs["inv"], inverse=True,
                                   axis=axis)
        return sharded_ntt(n, x, mesh, inverse=True, axis=axis)

    def coset_fft(x):
        x = F.mont_mul(FRs, x, N2.powers(FR_GENERATOR, n))
        if tabs is not None:
            return sharded_ntt_mxu(n, x, mesh, tabs["fwd"], axis=axis)
        return sharded_ntt(n, x, mesh, axis=axis)

    av = coset_fft(ifft(a))
    bv = coset_fft(ifft(b))
    cv_ = coset_fft(ifft(c))
    ab = F.mont_mul(FRs, av, bv)
    ab = F.sub(FRs, ab, cv_)
    z_inv = modinv((pow(FR_GENERATOR, n, R) - 1) % R, R)
    ab = F.mont_mul(FRs, ab, F.mont_const(FRs, z_inv, (1,)))
    h = ifft(ab)
    h = F.mont_mul(FRs, h, N2.powers(gen_inv, n))
    h = F.from_mont(FRs, h)
    return h.at[-1].set(0)


# ---------------------------------------------------------------------------
# Distributed four-step MXU NTT.
# ---------------------------------------------------------------------------


def mesh_ntt_factors(n: int, ndev: int):
    """n = n1 * n2 with ndev dividing both (n1 is the all_to_all split
    axis, n2 the sharded input axis)."""
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    n2 = n // n1
    assert n2 % ndev == 0 and n1 % ndev == 0, "mesh must divide both factors"
    return n1, n2


def mesh_ntt_tables(n: int, ndev: int, inverse: bool = False):
    """Device DFT-matrix + twiddle tables for one mesh transform
    direction, built on host and passed into the jitted transform as
    ARGUMENTS (the matrices are ~38 MB each — embedding them as jit
    constants blows the remote-compile payload, same constraint as
    engine._mxu_tables)."""
    from ..ops import ntt_mxu as NM

    n1, n2 = mesh_ntt_factors(n, ndev)
    d = N.Domain(n)
    omega = d.omega_inv if inverse else d.omega
    omega1 = pow(omega, n2, R)
    omega2 = pow(omega, n1, R)
    loc2 = n2 // ndev  # local columns in stage 1
    loc1 = n1 // ndev  # local rows in stage 2
    return {
        "mats1": NM.make_mats(n1, omega1),
        "tws1": NM.make_twiddles(n1, omega1, batch=loc2),
        "mats2": NM.make_mats(n2, omega2),
        "tws2": NM.make_twiddles(n2, omega2, batch=loc1),
    }


def sharded_ntt_mxu(n: int, a, mesh: Mesh, tabs, inverse: bool = False,
                    axis: str = "data"):
    """Four-step NTT over the mesh with the local transforms as MXU
    matmul passes (ops.ntt_mxu.fft_t_mxu batched along the untouched
    factor) — the mesh form of the single-chip MXU transform, replacing
    the round-1 radix-2 butterfly locals.

    Same contract as :func:`sharded_ntt`: [n, L] Montgomery limbs in
    natural order -> NTT in natural order, ONE all_to_all per transform
    (the reference's parallel_fft twiddle recombination,
    domain.rs:317-374, as a cross-chip transpose).  ``tabs`` from
    :func:`mesh_ntt_tables` (matching ``inverse``).
    """
    ndev = _axis_size(mesh, axis)
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    n1, n2 = mesh_ntt_factors(n, ndev)
    from ..ops import ntt_mxu as NM

    d = N.Domain(n)
    omega = d.omega_inv if inverse else d.omega
    omega1 = pow(omega, n2, R)
    omega2 = pow(omega, n1, R)
    L = FR.n_limbs
    K = 1 << ((log_n + 1) // 2)
    pw_lo = N.powers(omega, K)                  # omega^i, i < K
    pw_hi = N.powers(pow(omega, K, R), n // K + 1)

    def local(a_blk, mats1, tws1, mats2, tws2):
        # a_blk: [n1, loc, L] — columns j2 in [dev*loc : (dev+1)*loc]
        loc = a_blk.shape[1]
        dev = jax.lax.axis_index(axis)
        # 1) local length-n1 column FFTs on the MXU, batch = loc columns
        # (batch-major in, batch-minor out: [L, k1, loc])
        x1 = jnp.transpose(a_blk, (2, 1, 0)).reshape(L, loc * n1)
        y = NM.fft_t_mxu(x1, omega1, n1, tws=tws1, mats=mats1,
                         batch=loc).reshape(L, n1, loc)
        # 2) twiddle omega^(k1 * j2_global) via exponent splitting
        k1 = jax.lax.broadcasted_iota(jnp.int32, (n1, loc), 0)
        j2 = jax.lax.broadcasted_iota(jnp.int32, (n1, loc), 1) + dev * loc
        e = (k1 * j2) % n
        tw = F.mont_mul(FR, jnp.take(pw_lo, e % K, axis=0),
                        jnp.take(pw_hi, e // K, axis=0))  # [n1, loc, L]
        y = F.mont_mul(FR, jnp.transpose(y, (1, 2, 0)), tw)  # [n1, loc, L]
        # 3) cross-chip transpose: keep n1/ndev rows of k1, gather all j2
        y = jax.lax.all_to_all(y, axis, 0, 1, tiled=True)  # [n1loc, n2, L]
        # 4) local length-n2 row FFTs, batch = n1loc rows
        loc1 = y.shape[0]
        x2 = jnp.transpose(y, (2, 0, 1)).reshape(L, loc1 * n2)
        z = NM.fft_t_mxu(x2, omega2, n2, tws=tws2, mats=mats2,
                         batch=loc1).reshape(L, n2, loc1)
        return jnp.transpose(z, (2, 1, 0))  # [n1loc, n2, L] = [k1, k2, L]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(), P(), P(), P()),
        out_specs=P(axis, None),
        check_rep=False,
    )
    out = fn(a.reshape(n1, n2, L), tabs["mats1"], tabs["tws1"],
             tabs["mats2"], tabs["tws2"])
    # X[k1 + n1*k2] = out[k1, k2] -> natural order via transpose-reshape
    out = jnp.swapaxes(out, 0, 1).reshape(n, L)
    if inverse:
        out = F.mont_mul(FR, out, F.mont_const(FR, modinv(n, R), (1,)))
    return out


# ---------------------------------------------------------------------------
# Distributed four-step NTT (radix-2 butterfly locals — the round-1 form,
# kept as the CPU-friendly reference implementation of the same
# decomposition; sharded_ntt_mxu above is the production path).
# ---------------------------------------------------------------------------


def _fft_axis0(a, omega_int: int, n: int):
    """Radix-2 DIT over axis 0 of [n, B, L] (B = local batch columns)."""
    idx = jnp.asarray(N._bitrev_indices(n))
    a = jnp.take(a, idx, axis=0)
    pw = N.powers(omega_int, max(n // 2, 1))
    log_n = n.bit_length() - 1
    tail = a.shape[1:]
    for s in range(log_n):
        m = 1 << s
        stride = n // (2 * m)
        w = pw[::stride][:m]  # [m, L]
        a = a.reshape((n // (2 * m), 2, m) + tail)
        lo, hi = a[:, 0], a[:, 1]
        t = F.mont_mul(FR, hi, w[None, :, None, :])
        a = jnp.stack([F.add(FR, lo, t), F.sub(FR, lo, t)], axis=1)
    return a.reshape((n,) + tail)


def sharded_ntt(n: int, a, mesh: Mesh, inverse: bool = False,
                axis: str = "data"):
    """Four-step NTT of a [n, L] Montgomery coefficient array over a mesh.

    n = n1 * n2 with n2 divisible by the mesh size.  Input sharded by
    rows of the [n1, n2] view; output is the NTT in natural order, sharded
    the same way.  Stages: local length-n1 FFTs, twiddles, all_to_all
    transpose, local length-n2 FFTs.
    """
    ndev = _axis_size(mesh, axis)
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    l1 = log_n // 2
    n1 = 1 << l1
    n2 = n // n1
    assert n2 % ndev == 0 and n1 % ndev == 0, "mesh must divide both factors"

    d = N.Domain(n)
    omega = d.omega_inv if inverse else d.omega
    omega1 = pow(omega, n2, R)  # length-n1 root
    omega2 = pow(omega, n1, R)  # length-n2 root
    L = FR.n_limbs

    def local(a_blk):
        # a_blk: [n1, n2/ndev, L] — columns j2 in [dev*loc : (dev+1)*loc]
        loc = a_blk.shape[1]
        dev = jax.lax.axis_index(axis)
        # 1) column FFTs (over j1, full locally)
        y = _fft_axis0(a_blk, omega1, n1)  # [n1, loc, L] indexed [k1, j2]
        # 2) twiddle omega^(k1 * j2_global)
        k1 = jax.lax.broadcasted_iota(jnp.int32, (n1, loc), 0)
        j2 = jax.lax.broadcasted_iota(jnp.int32, (n1, loc), 1) + dev * loc
        # twiddle exponent k1*j2 mod n; build from powers table via
        # exponent splitting: omega^(e) = pw_lo[e % K] * pw_hi[e // K]
        e = (k1 * j2) % n
        K = 1 << ((log_n + 1) // 2)
        pw_lo = N.powers(omega, K)                  # omega^i, i < K
        pw_hi = N.powers(pow(omega, K, R), n // K + 1)
        tw = F.mont_mul(FR, jnp.take(pw_lo, e % K, axis=0),
                        jnp.take(pw_hi, e // K, axis=0))
        y = F.mont_mul(FR, y, tw)
        # 3) transpose across chips: each device keeps its n1/ndev rows of
        # k1 and gathers all of j2.  Tiled all_to_all splits the k1 axis
        # into ndev blocks and concatenates received j2 column blocks in
        # peer order: [n1, loc] -> [n1/ndev, ndev*loc = n2].
        y = jax.lax.all_to_all(y, axis, 0, 1, tiled=True)
        # 4) row FFTs over j2 (length n2): transpose to axis 0
        z = _fft_axis0(jnp.swapaxes(y, 0, 1), omega2, n2)  # [n2(k2), n1loc, L]
        return jnp.swapaxes(z, 0, 1)  # [n1loc, n2] indexed [k1, k2]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=P(None, axis), out_specs=P(axis, None),
        check_rep=False,
    )
    out = fn(a.reshape(n1, n2, L))
    # X[k1 + n1*k2] = out[k1, k2] -> natural order via transpose-reshape
    out = jnp.swapaxes(out, 0, 1).reshape(n, L)
    if inverse:
        out = F.mont_mul(FR, out, F.mont_const(FR, modinv(n, R), (1,)))
    return out
