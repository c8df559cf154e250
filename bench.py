"""Headline benchmark: the whole Sapling Spend proof + the 131k MSM.

The reference's two headline numbers (tex/Figures/wholeproof.py:7,
finalresults.py:7): the whole Sapling Spend proof (2.0 s on the i7-7700HQ,
instrumented at prover.rs:283,357) and the 131,071-point BLS12-381 G1 MSM
from the same proof's H vector (0.75 s CPU best; 0.96 s best GPU).

Default mode runs BOTH — the bare 131k MSM on distinct seeded fixture
points, then the real warm ``create_proof`` on the 98,777-constraint Spend
circuit with the cached CRS — and prints ONE final JSON line carrying both
metrics.  The spend "compute" figure includes pack/upload (host->device
transfer of the evaluation vectors), matching what the reference's 2.0 s
covers; witness synthesis and FFI wall time are reported beside it.

Run on whatever backend is available (TPU under axon; CPU fallback works
but is not the scored configuration).
"""

import argparse
import json
import random
import time

N = 131071
BASELINE_S = 0.75  # CPU Pippenger, i7-7700HQ (tex/Figures/finalresults.py:7)

# Whole-Spend-proof compute baseline: 2.0 s on the i7-7700HQ (64-bit),
# split ~0.3 s FFT + ~1.65 s multiexp (tex/Figures/wholeproof.py:7,
# proofparts.py:7-8).
PROVER_BASELINE_S = 2.0


def bench_prover(scale: int = 1):
    """Replay the Sapling Spend proving workload shapes — the reference's
    ``test_proof()`` dump-replay bench (prover.rs:367-868): the H(x) FFT
    chain on the 2^17 domain plus the prover's MSMs (h/l/a/b_g1/b_g2) at
    the dumped sizes, on synthetic data of the same shape.

    Runs through the production device-resident engine path
    (h_poly_dev -> digit planes -> bucket kernels with the device-form
    CRS cache), exactly what a real warm proof executes; the timed region
    covers device compute + window readback."""
    import numpy as np

    import jax.numpy as jnp

    from zcash_gpu_thesis_tpu.groth16 import BlsEngine
    from zcash_gpu_thesis_tpu.oracle import curve as O
    from zcash_gpu_thesis_tpu.ops import field as Ff

    rng = random.Random(0x5DBE6259)
    # dump shapes (prover.rs:425-790); scale>1 shrinks everything for a
    # CPU smoke run of the same code path
    n_constraints = 98785 // scale
    sizes_g1 = {"h": 131071 // scale, "l": 98638 // scale,
                "a": 85390 // scale, "b_g1": 61300 // scale}
    n_g2 = 61300 // scale

    e = BlsEngine()
    m = (1 << 17 if scale == 1
         else 1 << max(n_constraints.bit_length(), 4))
    d = e.domain(m)

    def pack_mont(n):
        arr = Ff.batch_to_limbs(Ff.FR, [rng.randrange(O.R) for _ in range(n)])
        return jnp.asarray(np.pad(arr, ((0, m - n), (0, 0))))

    a_m, b_m, c_m = pack_mont(n_constraints), pack_mont(n_constraints), \
        pack_mont(n_constraints)

    base = O.random_g1_points(rng, 64)
    base2 = O.random_g2_points(rng, 8)
    g1_bases = {k: [base[i % 64] for i in range(n)]
                for k, n in sizes_g1.items()}
    g2_bases = [base2[i % 8] for i in range(n_g2)]

    def scalars_dev(n):
        return jnp.asarray(Ff.batch_to_limbs(
            Ff.FR, [rng.randrange(O.R) for _ in range(n)], mont=False))

    scal = {k: scalars_dev(n) for k, n in sizes_g1.items()}
    scal_g2 = scalars_dev(n_g2)

    def run_msms(h_scal):
        outs = [e.msm_g1(g1_bases["h"], h_scal)]
        for k in ("l", "a", "b_g1"):
            outs.append(e.msm_g1(g1_bases[k], scal[k]))
        outs.append(e.msm_g2(g2_bases, scal_g2))
        return outs

    def sync(x):
        np.asarray(x[0])  # force a real host read (tunnel-safe sync)

    # warmup: compiles + device-form base cache upload + digit planes
    h_scal = d.h_poly_dev(a_m, b_m, c_m)
    sync(h_scal)
    run_msms(h_scal)

    t0 = time.perf_counter()
    h_scal = d.h_poly_dev(a_m, b_m, c_m)
    sync(h_scal)
    t_fft = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_msms(h_scal)
    t_msm = time.perf_counter() - t0
    t = t_fft + t_msm
    print(json.dumps({
        "metric": "sapling_prover_replay",
        "value": round(t, 4),
        "unit": "s",
        "vs_baseline": round(PROVER_BASELINE_S / t, 3),
        "fft_s": round(t_fft, 4),
        "msm_s": round(t_msm, 4),
    }))


def _stats(xs):
    import statistics

    xs = sorted(xs)
    k = max(0, min(len(xs) - 1, round(0.95 * (len(xs) - 1))))
    return {"min": round(xs[0], 4),
            "median": round(statistics.median(xs), 4),
            "p95": round(xs[k], 4), "n": len(xs)}


def bench_spend(repeat: int = 10, emit: bool = True):
    """True warm whole-proof wall-clock: a real ``create_proof`` on the
    98,777-constraint Sapling Spend circuit with a real witness and the
    cached CRS — the reference's headline 2.0 s workload
    (wholeproof.py:7, instrumented at prover.rs:283,357).

    The headline "compute" = create_proof total minus witness synthesis:
    pack/upload + FFT + MSMs + blinding (the reference's 2.0 s covers its
    cheap equivalents of all of these); synthesis and the full FFI wall
    time are reported alongside."""
    import io
    from contextlib import redirect_stdout

    class _Args:
        params = "params_cache"
        tpu = True  # don't force cpu; uses whatever backend is default
        repeat = 1

    from zcash_gpu_thesis_tpu.ffi import api as A
    from zcash_gpu_thesis_tpu.groth16 import BlsEngine, prover as P

    import examples.sapling_demo as demo

    e = BlsEngine()
    buf = io.StringIO()
    with redirect_stdout(buf):
        spend_params, output_params = demo.get_params(_Args(), e)
    A.librustzcash_init_zksnark_params(spend_params, output_params)

    rng = random.Random(1234)
    from zcash_gpu_thesis_tpu.protocol import jubjub as J

    ask, nsk = rng.randrange(J.FS), rng.randrange(J.FS)
    ak = A.librustzcash_ask_to_ak(ask.to_bytes(32, "little"))
    d = next(i.to_bytes(11, "little") for i in range(64)
             if A.librustzcash_check_diversifier(i.to_bytes(11, "little")))
    ivk = A.librustzcash_crh_ivk(
        ak, A.librustzcash_nsk_to_nk(nsk.to_bytes(32, "little")))
    pk_d = A.librustzcash_ivk_to_pkd(ivk, d)
    value = 100_000
    rcm = A.librustzcash_sapling_generate_r()
    cm = A.librustzcash_sapling_compute_cm(d, pk_d, value, rcm)
    siblings, node = [], A.librustzcash_tree_uncommitted()
    for depth in range(32):
        siblings.append(node)
        node = A.librustzcash_merkle_hash(depth, node, node)
    anchor = cm
    for depth in range(32):
        anchor = A.librustzcash_merkle_hash(depth, anchor, siblings[depth])
    witness = bytes([32])
    for s in reversed(siblings):
        witness += bytes([32]) + s
    witness += (0).to_bytes(8, "little")
    ar = rng.randrange(J.FS)

    runs = []
    # two warmup iterations: the first compiles the steady-state shapes,
    # the second flushes stragglers (a late kernel compile inside a
    # "warm" repeat poisons the p95 with a 30+ s outlier)
    for it in range(repeat + 2):
        ctx = A.librustzcash_sapling_proving_ctx_init()
        t0 = time.perf_counter()
        res = A.librustzcash_sapling_spend_proof(
            ctx, ak, nsk.to_bytes(32, "little"), d, rcm,
            ar.to_bytes(32, "little"), value, anchor, witness, rng=rng,
        )
        wall = time.perf_counter() - t0
        assert res is not None, "spend proof failed"
        runs.append((wall, dict(P.last_timings)))

    runs = runs[2:]
    wall, tm = min(runs, key=lambda r: sum(
        v for k, v in r[1].items()
        if k not in ("synthesis", "total")))
    msm = sum(v for k, v in tm.items() if k.startswith("msm"))
    compute = tm.get("total", 0) - tm.get("synthesis", 0)
    computes = [t.get("total", 0) - t.get("synthesis", 0)
                for _, t in runs]
    walls = [w for w, _ in runs]
    out = {
        "metric": "sapling_spend_proof",
        "value": round(compute, 4),
        "unit": "s",
        "vs_baseline": round(PROVER_BASELINE_S / compute, 3),
        "fft_s": round(tm.get("fft (h poly)", 0), 4),
        "msm_s": round(msm, 4),
        "msm_split": {k.split()[1]: round(v, 4) for k, v in tm.items()
                      if k.startswith("msm")},
        "synthesis_s": round(tm.get("synthesis", 0), 4),
        "pack_s": round(tm.get("pack/upload", 0), 4),
        "create_proof_total_s": round(tm.get("total", 0), 4),
        "ffi_wall_s": round(wall, 4),
        # variance over the warm repeats (the thesis reports stressed /
        # worst-case numbers, wholeproof.py:7-8)
        "compute_stats": _stats(computes),
        "wall_stats": _stats(walls),
    }
    if emit:
        print(json.dumps(out))
    return out


def _rand_fr_limbs_np(rng_np, n):
    """[n, 24] 12-bit limbs of uniform scalars < 2^248 (< r), vectorized
    (python-int scalar generation is too slow at 2^24)."""
    import numpy as np

    limbs = rng_np.integers(0, 4096, size=(n, 24), dtype=np.int64)
    limbs[:, 21:] = 0
    limbs[:, 20] &= 0xFF
    return limbs


def _digits_np(limbs, c: int):
    """Vectorized digits_from_ints over a [n, 24] 12-bit limb array."""
    import numpy as np

    from zcash_gpu_thesis_tpu.constants import FR_BITS

    w_count = -(-FR_BITS // c)
    out = np.zeros((limbs.shape[0], w_count), np.int32)
    for w in range(w_count):
        bit = c * w
        l0, s0 = divmod(bit, 12)
        d = limbs[:, l0] >> s0
        if s0 + c > 12 and l0 + 1 < 24:
            d = d | (limbs[:, l0 + 1] << (12 - s0))
        out[:, w] = d & ((1 << c) - 1)
    return out


def bench_large_msm(log_n: int, group_name: str = "g1"):
    """2^log_n-point MSM through the sliced VMEM bucket sweep
    (BASELINE configs 3/5; the reference's 10M-point fixture bench,
    ec.rs:2527-2552), with a bit-exact oracle check: the point stream
    tiles a small base set, so the true result is sum_j (sum of class-j
    scalars) * P_j — 64 host scalar-mults, independent of n.

    Timing covers device compute (point tiling, bucket sweeps, in-VMEM
    combine) plus ONE packed-point readback.  The point stream is tiled
    from a device-resident base table and the digit planes are uploaded
    once before timing — in production the CRS bases live in the
    engine's device cache across proofs, and the tunnel's ~50 MB/s
    host link is an artifact of the remote-TPU setup, not the part the
    thesis's device benchmarks measured.

    Prints points/s with vs_baseline against the reference CPU's
    ~175k points/s (0.75 s / 131k, finalresults.py:7)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from zcash_gpu_thesis_tpu.constants import R as FR_MOD
    from zcash_gpu_thesis_tpu.ops import curve as cv
    from zcash_gpu_thesis_tpu.ops import msm as M
    from zcash_gpu_thesis_tpu.ops import msm_pallas as MP
    from zcash_gpu_thesis_tpu.oracle import curve as O

    from zcash_gpu_thesis_tpu.config import g2_c, msm_config

    n = 1 << log_n
    g2 = group_name == "g2"
    group = cv.G2 if g2 else cv.G1
    nbase = 16 if g2 else 64
    rng = random.Random(0x5DBE6259)
    rng_np = np.random.default_rng(0x5DBE6259)
    base = (O.random_g2_points(rng, nbase) if g2
            else O.random_g1_points(rng, nbase))
    aff_base = (cv.g2_affine_from_ints(base) if g2
                else cv.g1_affine_from_ints(base))
    aff_dev = jax.tree.map(jnp.asarray, aff_base)

    # production window widths (the kernels every proof runs)
    c = g2_c() if g2 else msm_config().c
    limbs = _rand_fr_limbs_np(rng_np, n)
    digits = M.recode_signed(_digits_np(limbs, c), c).astype(np.int8)

    slice_n = min(n, 1 << (16 if g2 else 20))
    chunks, k_inner = (16, 8)
    if g2 and n > slice_n and (1 << (c - 1)) > 32:
        # chained-state G2 sweeps at nb>32 exceed scoped VMEM at full
        # lane width; halve the chunks like the engine does (engine.py)
        chunks = 8

    # digit planes resident before timing (one-time upload; scalars in a
    # real proof arrive as one int16 limb upload, see prover.pack_canon)
    dig_dev = [jnp.asarray(digits[s:min(s + slice_n, n)])
               for s in range(0, n, slice_n)]
    jax.block_until_ready(dig_dev)

    def tile_points(s):
        idx = (jnp.arange(slice_n, dtype=jnp.int32) + s) % nbase
        return jax.tree.map(lambda l: jnp.take(l, idx, axis=0), aff_dev)

    def sweep():
        # chained bucket state across fixed-size kernel passes (one
        # executable, bounded HBM) + one in-VMEM combine kernel; readback
        # is a single packed projective point
        state = None
        for i, s in enumerate(range(0, n, slice_n)):
            state = MP.bucket_state(
                group, tile_points(s), dig_dev[i],
                c, chunks, k_inner, init=state)
        packed = MP.combine_state_pallas(group, state, c, chunks,
                                         digits.shape[1])
        return np.asarray(packed)  # force full sync through the tunnel

    import contextlib

    import jax

    ctx = contextlib.nullcontext()
    if jax.default_backend() == "cpu":  # smoke-test path
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
    with ctx:
        sweep()  # warmup: compile + first transfers of this size class
        t0 = time.perf_counter()
        out = sweep()
        t = time.perf_counter() - t0

    # oracle check (class sums mod r, vectorized per limb col)
    acc = MP.packed_to_int_point(group, out)
    add = O.g2_add if g2 else O.g1_add
    mul = O.g2_mul if g2 else O.g1_mul
    want = None
    for j in range(nbase):
        cls = limbs[j::nbase]
        tot = sum(int(cls[:, k].sum()) << (12 * k) for k in range(24))
        want = add(want, mul(base[j], tot % FR_MOD))
    ok = acc == want
    print(json.dumps({
        "metric": f"{group_name}_msm_2^{log_n}",
        "value": round(t, 4),
        "unit": "s",
        "points_per_s": round(n / t),
        "vs_baseline": round((n / t) / 174_761, 3),
        "bit_exact": ok,
    }))
    assert ok, "large MSM does not match the oracle"


def bench_ntt(log_n: int = 23):
    """2^log_n-point Fr NTT (BASELINE config 5's 2^23 domain): times the
    production coset H(x)-style chain (coset_fft + icoset_fft) and
    bit-checks a sparse polynomial's evaluations against host pow().

    butterflies/s counts log_n * n/2 per transform."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from zcash_gpu_thesis_tpu.constants import R as FR_MOD
    from zcash_gpu_thesis_tpu.ops import field as Ff
    from zcash_gpu_thesis_tpu.ops.ntt import Domain

    n = 1 << log_n
    d = Domain(n)
    rng_np = np.random.default_rng(0x5DBE6259)
    a = _rand_fr_limbs_np(rng_np, n).astype(np.int16)

    def run(x):
        out = d.icoset_fft(d.coset_fft(x))
        np.asarray(out[0])  # tunnel-safe sync
        return out

    a_dev = jnp.asarray(a)  # coefficients resident before timing
    jax.block_until_ready(a_dev)
    run(a_dev)  # warmup: compile
    t0 = time.perf_counter()
    run(a_dev)
    t = time.perf_counter() - t0
    bflies = 2 * log_n * (n // 2)

    # bit-exact sampled check: 4-term polynomial, evals vs host pow()
    rng = random.Random(7)
    coeffs = {rng.randrange(n): rng.randrange(FR_MOD) for _ in range(4)}
    sparse = np.zeros((n, 24), np.int16)
    for i, v in coeffs.items():
        mont = v * pow(2, 12 * 24, FR_MOD) % FR_MOD
        for k in range(24):
            sparse[i, k] = (mont >> (12 * k)) & 0xFFF
    evals = d.fft(jnp.asarray(sparse))
    idxs = [0, 1, n // 2, n - 1]
    got = Ff.batch_from_limbs(Ff.FR, np.asarray(evals)[idxs])
    ok = all(
        g % FR_MOD == sum(v * pow(d.omega, i * e, FR_MOD)
                          for e, v in coeffs.items()) % FR_MOD
        for g, i in zip(got, idxs)
    )
    print(json.dumps({
        "metric": f"fr_ntt_2^{log_n}_coset_chain",
        "value": round(t, 4),
        "unit": "s",
        "butterflies_per_s": round(bflies / t),
        "bit_exact": ok,
    }))
    assert ok, "NTT sampled evaluations do not match host pow()"


def bench_msm_131k(emit: bool = True):
    import jax.numpy as jnp

    from zcash_gpu_thesis_tpu.oracle import curve as O
    from zcash_gpu_thesis_tpu.ops import curve as cv
    from zcash_gpu_thesis_tpu.ops import msm as M
    from zcash_gpu_thesis_tpu.ops.curve import G1

    # 131,071 DISTINCT points from the seeded fixture stream (the
    # reference's generate_points, ec.rs:2527-2552): point i = k_i * G for
    # xorshift128-seeded k_i, computed by the device batched fixed-base
    # walk; scalars from the same stream.  Known k_i make the bit-exact
    # oracle one host mult: sum_i s_i * (k_i G) = (sum_i s_i k_i) * G.
    from zcash_gpu_thesis_tpu.groth16 import BlsEngine
    from zcash_gpu_thesis_tpu.utils.fixtures import XorShift128

    fx = XorShift128()
    ks = [fx.fr() for _ in range(N)]
    scalars = [fx.fr() for _ in range(N)]
    pts = BlsEngine().fixed_base_g1(ks)

    from zcash_gpu_thesis_tpu.config import msm_config, msm_hybrid_c
    from zcash_gpu_thesis_tpu.ops import msm_pallas as MP

    # Hybrid host+device window split (the thesis's Chapter7 proposal):
    # top-k windows on native host threads overlapped with the device
    # sweep.  ZKTPU_MSM_HYBRID_WINDOWS=-1 balances from measured rates,
    # 0 disables; default -1 on TPU when the native library is built.
    from zcash_gpu_thesis_tpu import native as NV
    from zcash_gpu_thesis_tpu.config import msm_hybrid_windows
    from zcash_gpu_thesis_tpu.ops.msm_hybrid import msm_hybrid

    cfg = msm_config()
    hw = msm_hybrid_windows()
    hybrid = (hw != 0 and cfg.impl == "pallas" and NV.available())
    # hybrid and pure-device sweeps have different measured-best widths
    c, chunks, k_inner = (msm_hybrid_c() if hybrid else cfg.c), 16, 8

    aff = cv.g1_affine_from_ints(pts)
    digits_np = M.recode_signed(M.digits_from_ints(scalars, c), c)
    digits = jnp.asarray(digits_np)
    stage = NV.MsmStage(pts, g2=False) if hybrid else None

    def run():
        # VMEM-resident bucket kernel on TPU; XLA scan path on CPU.
        # The device-side window combine means the sync/readback is one
        # projective point, not [W] sums + a python-int ladder.
        if hybrid:
            return msm_hybrid(G1, "g1", pts, aff, digits_np, c, chunks,
                              k_inner, host_windows=hw, stage=stage,
                              digits_dev=digits)
        if cfg.impl == "pallas":
            return MP.msm_host_pallas_fused(G1, aff, digits, c, chunks,
                                            k_inner)
        return M.msm_host(G1, aff, digits, c, 256, k_inner, signed=True)

    out = run()  # warmup/compile
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        out = run()
        times.append(time.perf_counter() - t0)
    t = min(times)

    # bit-exact check: one host mult of the generator (k_i known above)
    want = O.g1_mul(O.G1_GEN,
                    sum(s * k for s, k in zip(scalars, ks)) % O.R)
    ok = out == want
    res = {
        "metric": "g1_msm_131k",
        "value": round(t, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / t, 3),
        "bit_exact": ok,
        "stats": _stats(times),
    }
    if emit:
        print(json.dumps(res))
    assert ok, "headline MSM does not match the oracle"
    return res




def bench_gen():
    """CRS generation timing (the reference instruments its generator
    path; VERDICT r4 noted ours was measured nowhere).  Generates the
    Sapling Output CRS (7,827 constraints) fresh with a seeded toxic
    waste into a throwaway dir and reports the wall + phase split."""
    import tempfile

    from zcash_gpu_thesis_tpu.circuits.sapling import Output
    from zcash_gpu_thesis_tpu.groth16 import (BlsEngine,
                                              generate_parameters,
                                              prepare_verifying_key,
                                              verify_proof)

    e = BlsEngine()
    rng = random.Random(0x5DBE6259)
    t0 = time.perf_counter()
    p = generate_parameters(
        e, Output(),
        alpha=rng.randrange(1, e.r), beta=rng.randrange(1, e.r),
        gamma=rng.randrange(1, e.r), delta=rng.randrange(1, e.r),
        tau=rng.randrange(1, e.r))
    t = time.perf_counter() - t0
    print(json.dumps({
        "metric": "output_crs_generation", "value": round(t, 2),
        "unit": "s", "vs_baseline": 1.0,
        "n_constraints": 7827, "a_bases": len(p.a),
        "h_bases": len(p.h)}))


def bench_sprout(repeat: int = 2, emit: bool = True):
    """Warm Sprout JoinSplit proof (1,989,085 constraints, 2^21 domain)
    with full phase split — the largest circuit the reference ships
    (circuit/sprout/mod.rs:465).  The thesis benchmarks only Spend, so
    there is no direct reference number; the honest yardstick is the
    reference CPU prover's measured throughput on Spend (2.0 s for a
    2^17 domain + ~437k MSM points) scaled by Sprout's ~20x constraint
    count => ~40 s-class on the i7-7700HQ.  vs_baseline uses that
    scaling estimate."""
    import os

    from zcash_gpu_thesis_tpu.ffi import api as A
    from zcash_gpu_thesis_tpu.groth16 import prover as P, witness
    from zcash_gpu_thesis_tpu.protocol import codecs, sprout as H

    witness.set_params_dir("params_cache")
    path = os.path.join("params_cache", "sprout-groth16.params")
    if not os.path.exists(path):
        raise SystemExit("sprout params missing (examples/sprout_demo.py)")
    t0 = time.perf_counter()
    with open(path, "rb") as f:
        sp = codecs.params_from_bytes(f.read(), check=False)
    t_params = time.perf_counter() - t0

    rng = random.Random(0x5DBE6259)

    def rand32():
        return bytes(rng.randrange(256) for _ in range(32))

    phi, h_sig = rand32(), rand32()
    rt = H.uncommitted()
    for _ in range(A.SPROUT_TREE_DEPTH):
        rt = H.merkle_combine(rt, rt)
    sibling = H.uncommitted()
    auth = bytes([A.SPROUT_TREE_DEPTH])
    for _ in range(A.SPROUT_TREE_DEPTH):
        auth += bytes([32]) + sibling
    auth += (0).to_bytes(8, "little")
    out_pk = [H.prf_a_pk(rand32()) for _ in range(2)]

    runs = []
    for it in range(repeat + 1):  # one warmup (compiles/caches)
        t0 = time.perf_counter()
        proof = A.librustzcash_sprout_prove(
            sp, phi, rt, h_sig,
            rand32(), 0, rand32(), rand32(), auth,
            rand32(), 0, rand32(), rand32(), auth,
            out_pk[0], 60_000, rand32(),
            out_pk[1], 40_000, rand32(),
            100_000, 0, rng=rng)
        wall = time.perf_counter() - t0
        assert proof is not None and len(proof) == 192
        runs.append((wall, dict(P.last_timings)))
    runs = runs[1:]
    wall, tm = min(runs, key=lambda r: r[0])
    msm = sum(v for k, v in tm.items() if k.startswith("msm"))
    out = {
        "metric": "sprout_joinsplit_proof",
        "value": round(wall, 3),
        "unit": "s",
        # reference-scaled estimate: 2.0 s x (1,989,085 / 98,777)
        "vs_baseline": round(2.0 * 1989085 / 98777 / wall, 3),
        "params_load_s": round(t_params, 2),
        "synthesis_s": round(tm.get("synthesis", 0), 3),
        "pack_s": round(tm.get("pack/upload", 0), 3),
        "spmv_s": round(tm.get("spmv (a,b,c)", 0), 3),
        "fft_s": round(tm.get("fft (h poly)", 0), 3),
        "msm_s": round(msm, 3),
        "msm_split": {k.split()[1]: round(v, 3) for k, v in tm.items()
                      if k.startswith("msm")},
        "create_proof_total_s": round(tm.get("total", 0), 3),
        "wall_stats": _stats([w for w, _ in runs]),
    }
    if emit:
        print(json.dumps(out))
    return out


def headline(repeat: int = 10):
    """Default mode: the bare 131k MSM AND the warm whole Spend proof,
    combined into ONE final JSON line (the driver parses the tail line,
    so both flagship metrics must be in it)."""
    msm = bench_msm_131k(emit=True)
    spend = bench_spend(repeat, emit=True)
    print(json.dumps({
        "metric": "headline",
        "value": spend["value"],
        "unit": "s",
        "vs_baseline": spend["vs_baseline"],
        "sapling_spend_proof_s": spend["value"],
        "spend_vs_baseline": spend["vs_baseline"],
        "g1_msm_131k_s": msm["value"],
        "msm_vs_baseline": msm["vs_baseline"],
        "fft_s": spend["fft_s"],
        "msm_s": spend["msm_s"],
        "msm_split": spend["msm_split"],
        "pack_s": spend["pack_s"],
        "synthesis_s": spend["synthesis_s"],
        "create_proof_total_s": spend["create_proof_total_s"],
        "ffi_wall_s": spend["ffi_wall_s"],
        "compute_stats": spend["compute_stats"],
        "wall_stats": spend["wall_stats"],
        "msm_stats": msm["stats"],
        "large": _load_large(),
        "bit_exact": msm["bit_exact"],
    }))


def _load_large():
    """Fold the committed large-n artifact (regenerated by
    ``--mode largeall``) into the headline tail JSON so the driver
    captures the 2^20/2^24 MSM and 2^23 NTT numbers machine-checkably
    (the reference commits its sweep data, tex/Figures/finalresults.py)."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "LARGE.json")
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def bench_large_all():
    """Regenerate LARGE.json: fresh 2^20 G1/G2, 2^24 G1 MSMs and the
    2^23 coset NTT chain on the current kernels, bit-exact-checked."""
    import io
    import os
    from contextlib import redirect_stdout

    rows = {}
    for name, fn in (
        ("g1_msm_2^20", lambda: bench_large_msm(20, "g1")),
        ("g2_msm_2^20", lambda: bench_large_msm(20, "g2")),
        ("g1_msm_2^24", lambda: bench_large_msm(24, "g1")),
        ("fr_ntt_2^23", lambda: bench_ntt(23)),
    ):
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn()
        row = json.loads(buf.getvalue().strip().splitlines()[-1])
        rows[name] = row
        print(json.dumps(row), flush=True)
    out = {"rows": rows}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "LARGE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "large_all", "value": len(rows),
                      "unit": "rows", "vs_baseline": 1.0}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode",
                    choices=["headline", "msm", "prover", "spend", "msm20",
                             "msm24", "ntt23", "large", "largeall",
                             "gen", "sprout"],
                    default="headline")
    ap.add_argument("--scale", type=int, default=1,
                    help="divide the prover-replay sizes (smoke testing)")
    ap.add_argument("--repeat", type=int, default=10)
    ap.add_argument("--log-n", type=int, default=0,
                    help="override log2(n) for mode=large")
    ap.add_argument("--group", choices=["g1", "g2"], default="g1")
    ns = ap.parse_args()
    mode = ns.mode

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/zktpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if mode == "headline":
        headline(ns.repeat)
    elif mode == "msm":
        bench_msm_131k()
    elif mode == "prover":
        bench_prover(ns.scale)
    elif mode == "spend":
        bench_spend(ns.repeat)
    elif mode == "msm20":
        bench_large_msm(20, ns.group)
    elif mode == "msm24":
        bench_large_msm(24, "g1")
    elif mode == "ntt23":
        bench_ntt(23)
    elif mode == "large":
        bench_large_msm(ns.log_n or 20, ns.group)
    elif mode == "largeall":
        bench_large_all()
    elif mode == "gen":
        bench_gen()
    elif mode == "sprout":
        bench_sprout(min(ns.repeat, 3))
