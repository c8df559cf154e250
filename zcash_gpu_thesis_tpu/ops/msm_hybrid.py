r"""Hybrid host+device window-split MSM.

Re-design of the thesis's proposed CPU+GPU hybrid (tex/Chapters/
Chapter7.tex:86; the `affine_mulexp_smart_lower_half/_lower_quarter`
kernels, bellman/src/bls12-381.cl:2496-2553): the device sweeps the LOW
scalar windows while a host thread concurrently accumulates the HIGH
windows, and the two partial sums combine with one scaled addition:

    total = sum_{w < s} 2^(cw) S_w  +  2^(cs) * sum_{w >= s} 2^(c(w-s)) S_w
            \------ device ------/     \----------- host -----------/

The thesis measured 25-30% end-to-end gain from this split because its
two resources had comparable EC throughput (4-core i7 vs RX 580).  On a
TPU v5e the host python-int bucket update is ~10^3x slower than the VMEM
kernel's, so the optimal split is zero host windows and the hybrid is
OFF by default — the capability is kept for component parity and for
deployments that pair the chip with a fast native host EC library.
Enable with ZKTPU_MSM_HYBRID_WINDOWS=<k> (top k windows on host).
"""

from __future__ import annotations

import threading

import jax.numpy as jnp


def _host_window_sums(group_name, bases, digits_np, c, lo_w):
    """sum_{w >= lo_w} 2^(c(w-lo_w)) S_w with python-int buckets."""
    from ..oracle import curve as O

    add = O.g2_add if group_name == "g2" else O.g1_add
    nb = 1 << (c - 1)
    w_count = digits_np.shape[1]
    total = None
    for w in range(w_count - 1, lo_w - 1, -1):
        for _ in range(c):
            total = add(total, total)
        buckets = [None] * (nb + 1)
        col = digits_np[:, w]
        for i, d in enumerate(col):
            d = int(d)
            if d == 0 or bases[i] is None:
                continue
            p = bases[i]
            if d < 0:
                p = (p[0], tuple((-y) % O.Q for y in p[1])) \
                    if group_name == "g2" else (p[0], (-p[1]) % O.Q)
                d = -d
            buckets[d] = add(buckets[d], p)
        running, wsum = None, None
        for b in range(nb, 0, -1):
            running = add(running, buckets[b])
            wsum = add(wsum, running)
        total = add(total, wsum)
    return total


def msm_hybrid(group, group_name, bases, aff, digits, c, chunks, k_inner,
               host_windows, slice_n=1 << 20):
    """Full MSM with the top `host_windows` windows on the host thread,
    overlapped with the device bucket sweep of the low windows.

    `bases`: python-int points (host side); `aff`: device affine pytree;
    `digits`: SIGNED [n, W] (host numpy or device).  Returns python-int
    affine."""
    import numpy as np

    from ..oracle import curve as O
    from . import msm_pallas as MP

    digits_np = np.asarray(digits)
    w_count = digits_np.shape[1]
    host_windows = max(0, min(host_windows, w_count - 1))
    lo_w = w_count - host_windows
    if host_windows == 0:
        return MP.msm_host_pallas_fused(group, aff, jnp.asarray(digits_np),
                                        c, chunks, k_inner, slice_n=slice_n)

    result = {}

    def host_part():
        result["host"] = _host_window_sums(group_name, bases, digits_np,
                                           c, lo_w)

    th = threading.Thread(target=host_part)
    th.start()
    dev = MP.msm_host_pallas_fused(
        group, aff, jnp.asarray(np.ascontiguousarray(digits_np[:, :lo_w])),
        c, chunks, k_inner, slice_n=slice_n)
    th.join()

    add = O.g2_add if group_name == "g2" else O.g1_add
    mul = O.g2_mul if group_name == "g2" else O.g1_mul
    hi = result["host"]
    if hi is not None:
        hi = mul(hi, (1 << (c * lo_w)) % O.R)
    return add(dev, hi)
