"""Multi-chip scaling report on the virtual CPU mesh.

Real multi-chip hardware is not reachable from this environment (one v5e
chip over a tunnel), so this report does what can be done honestly
without it: run the production sharded MSM + four-step NTT on 1/2/4/8
virtual devices (``--xla_force_host_platform_device_count``), verify
bit-exactness against the single-device kernels at every width, and
audit the compiled HLO for the collectives the design rides on
(all-gather of window partials for MSM; all-to-all transpose for the
NTT stage exchange).  Per-device shard sizes shrink linearly — the
compute side of the >=80% scaling-efficiency target — while the
collective payloads stay constant (MSM: W window partials) or linear/N
(NTT: the transposed block), which is the communication side.

Wall-clock on the virtual mesh is NOT a scaling measurement (all
devices share this host's 4 cores) and is deliberately not printed.

Usage: python scripts/scaling_report.py [log_n_points]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/zktpu_jax_cache")

import random  # noqa: E402

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from zcash_gpu_thesis_tpu.oracle import curve as O  # noqa: E402
from zcash_gpu_thesis_tpu.ops import curve as cv  # noqa: E402
from zcash_gpu_thesis_tpu.ops import field as F  # noqa: E402
from zcash_gpu_thesis_tpu.ops import msm as M  # noqa: E402
from zcash_gpu_thesis_tpu.ops.curve import G1  # noqa: E402
from zcash_gpu_thesis_tpu.ops.ntt import Domain  # noqa: E402
from zcash_gpu_thesis_tpu.parallel import mesh as pm  # noqa: E402


def collective_audit(fn, *args):
    """Count collective ops in the lowered/compiled HLO."""
    lowered = jax.jit(fn).lower(*args)
    txt = lowered.compile().as_text()
    return {
        "all-to-all": txt.count("all-to-all"),
        "all-gather": txt.count("all-gather"),
        "all-reduce": txt.count("all-reduce"),
        "collective-permute": txt.count("collective-permute"),
    }


def replay():
    """At-size mesh-prover evidence: the full Sapling Spend 2^17 H(x)
    chain through the 8-device mesh (MXU four-step locals, all_to_all
    transposes) bit-exact vs the single-device MXU chain, plus the
    engine's sharded MSM at the replay's b_g1 shape.  This is the
    prover-replay correctness run VERDICT r3 asked for — wall-clock on a
    virtual mesh is meaningless and not printed."""
    rng_np = np.random.default_rng(0x5DBE6259)
    from zcash_gpu_thesis_tpu.groth16.engine import _BlsDomain

    m = 1 << 17
    d = _BlsDomain(m)

    def rand_mont(n):
        limbs = rng_np.integers(0, 4096, size=(n, 24), dtype=np.int32)
        limbs[:, 21:] = 0
        return jnp.asarray(limbs)

    a, b, c = rand_mont(m), rand_mont(m), rand_mont(m)
    print("# at-size mesh prover replay (Sapling Spend shapes)")
    want = np.asarray(d.h_poly_dev(a, b, c))
    mesh = pm.default_mesh(8)
    tabs = pm.h_poly_tables(m, mesh)
    got = np.asarray(jax.jit(
        lambda a, b, c, t: pm.h_poly_sharded(m, a, b, c, mesh, tabs=t)
    )(a, b, c, tabs))
    print(f"| h_poly 2^17 mesh(8, mxu) == single-device | "
          f"{bool((got == want).all())} |")

    # sharded MSM at the replay b_g1 size (61,300 -> 2^16 pad), xla
    # window-sum impl (the pallas kernel is TPU-real-hardware territory;
    # interpret mode at this size is not runnable)
    n = 1 << 16
    rng = random.Random(7)
    base = O.random_g1_points(rng, 8)
    pts = [base[i % 8] for i in range(n)]
    scalars = [rng.randrange(O.R) for _ in range(n)]
    aff = cv.g1_affine_from_ints(pts)
    digits = jnp.asarray(M.recode_signed(M.digits_from_ints(scalars, 4),
                                         4))
    got_p = pm.sharded_msm_host(G1, aff, digits, mesh, c=4, chunks=4,
                                k_inner=2, signed=True)
    want_p = None
    for j in range(8):
        s = sum(scalars[j::8]) % O.R
        want_p = O.g1_add(want_p, O.g1_mul(base[j], s))
    print(f"| sharded MSM 2^16 mesh(8) == oracle | {got_p == want_p} |")


def audit_mxu_ntt():
    """HLO collective audit of the MXU mesh NTT: exactly one all-to-all
    per transform."""
    n = 1 << 12
    rng = random.Random(5)
    coeffs = jnp.asarray(F.batch_to_limbs(
        F.FR, [rng.randrange(F.FR.modulus) for _ in range(n)]))
    mesh = pm.default_mesh(8)
    tabs = pm.mesh_ntt_tables(n, 8)
    fn = lambda x, t: pm.sharded_ntt_mxu(n, x, mesh, t)
    audit = collective_audit(fn, coeffs, tabs)
    got = np.asarray(F.canon(F.FR, fn(coeffs, tabs)))
    want = np.asarray(F.canon(F.FR, Domain(n).fft(coeffs)))
    print(f"| MXU mesh NTT 2^12 == 1-dev | {bool((got == want).all())} | "
          + ", ".join(f"{k}:{v}" for k, v in audit.items() if v) + " |")


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    n = 1 << log_n
    n_ntt = 1 << 12
    rng = random.Random(0x5DBE6259)
    base = O.random_g1_points(rng, 8)
    pts = [base[i % 8] for i in range(n)]
    scalars = [rng.randrange(O.R) for _ in range(n)]
    aff_host = cv.g1_affine_from_ints(pts)
    digits_host = jnp.asarray(M.digits_from_ints(scalars, 4))
    coeffs = jnp.asarray(F.batch_to_limbs(
        F.FR, [rng.randrange(F.FR.modulus) for _ in range(n_ntt)]))

    dev0 = jax.devices()[0]
    want_p = M.msm(G1, jax.tree.map(lambda l: jax.device_put(l, dev0),
                                    aff_host),
                   jax.device_put(digits_host, dev0), 4, 8, 4)
    want_h = np.asarray(F.canon(F.FR, Domain(n_ntt).fft(
        jax.device_put(coeffs, dev0))))

    print(f"# sharded MSM (2^{log_n} pts) + four-step NTT (2^12) "
          f"across mesh widths")
    print("| devices | pts/device | MSM == 1-dev | NTT == 1-dev |"
          " collectives (MSM+NTT step) |")
    print("|---|---|---|---|---|")
    for ndev in (1, 2, 4, 8):
        mesh = pm.default_mesh(ndev)
        shard = NamedSharding(mesh, P("data"))
        aff = jax.tree.map(lambda l: jax.device_put(np.asarray(l), shard),
                           aff_host)
        digs = jax.device_put(np.asarray(digits_host), shard)

        def step(aff, digs, coeffs):
            p = pm.sharded_msm(G1, aff, digs, mesh, c=4, chunks=4,
                               k_inner=2)
            h = pm.sharded_ntt(n_ntt, coeffs, mesh)
            return p, h

        p, h = jax.jit(step)(aff, digs, coeffs)
        ok_p = bool(np.asarray(G1.eq(
            jax.tree.map(lambda l: jax.device_put(np.asarray(l), dev0), p),
            want_p)).all())
        got_h = np.asarray(F.canon(F.FR, jax.tree.map(
            lambda l: jax.device_put(np.asarray(l), dev0), h)))
        ok_h = bool((got_h == want_h).all())
        audit = collective_audit(step, aff, digs, coeffs)
        audit_s = ", ".join(f"{k}:{v}" for k, v in audit.items() if v)
        print(f"| {ndev} | {n // ndev} | {ok_p} | {ok_h} |"
              f" {audit_s or 'none'} |")


if __name__ == "__main__":
    if "--replay" in sys.argv:
        replay()
    elif "--audit-mxu" in sys.argv:
        audit_mxu_ntt()
    else:
        main()
