"""Groth16 prover.

Re-design of ``bellman/src/groth16/prover.rs``: witness synthesis into
per-constraint evaluation vectors (``ProvingAssignment``, prover.rs:84-190),
the H(x) computation (3x iFFT + coset FFT, pointwise a*b - c, divide by Z
on the coset, prover.rs:256-283), then the MSMs over the CRS bases
(prover.rs:289-318) and the r/s blinding algebra (prover.rs:326-354).

On the BLS engine the NTTs and MSMs run on TPU; synthesis and the final
single-point algebra are host-side — the same CPU/accelerator split as the
reference.
"""

from __future__ import annotations

import os
import random
import time
from typing import Optional

from . import witness, wtape
from .params import Parameters, Proof
from .r1cs import ConstraintSystem, LinearCombination, SynthesisError, Variable

# Reference prover prints FFT/exp phase timings (prover.rs:283,357);
# gate ours behind an env flag to keep library output clean by default.
# Every create_proof also records its phase timings in `last_timings`
# (seconds by label) for benches/telemetry to read programmatically.
_TIMING = os.environ.get("ZKTPU_PROVER_TIMING", "") not in ("", "0")

last_timings: dict = {}

_unpack_jit = None
_expand_jit = None
_perm_dev_cache: dict = {}


def _get_expand():
    """Device-side rebuild of the wire limb array from the bit-packed
    upload: unpack bit bytes -> one-limb rows, unpack the non-boolean
    sidecar limbs, and restore wire order with one gather over the
    shape-level permutation (wtape.CompiledTape.bit_plan)."""
    global _expand_jit
    if _expand_jit is None:
        import functools

        import jax
        import jax.numpy as jnp

        from ..constants import FR_LIMBS
        from ..utils.limbs import unpack_limbs_bytes

        def expand(bits_packed, nonbit_packed, perm, *, n_bits):
            shifts = jnp.arange(7, -1, -1, dtype=jnp.int32)
            bits = ((bits_packed.astype(jnp.int32)[:, None] >> shifts)
                    & 1).reshape(-1)[:n_bits].astype(jnp.int16)
            bit_rows = jnp.pad(bits[:, None], ((0, 0), (0, FR_LIMBS - 1)))
            nonbit = unpack_limbs_bytes(
                nonbit_packed, L=FR_LIMBS).astype(jnp.int16)
            z = jnp.concatenate([bit_rows, nonbit], axis=0)
            return jnp.take(z, perm, axis=0)

        _expand_jit = jax.jit(expand, static_argnames=("n_bits",))
    return _expand_jit


def _get_unpack():
    global _unpack_jit
    if _unpack_jit is None:
        import functools

        import jax

        from ..constants import FR_LIMBS
        from ..utils.limbs import unpack_limbs_bytes

        _unpack_jit = jax.jit(
            functools.partial(unpack_limbs_bytes, L=FR_LIMBS))
    return _unpack_jit


def _t(label, t0):
    dt = time.perf_counter() - t0
    last_timings[label] = dt
    if _TIMING:
        print(f"prover: {label} took {dt:.3f}s", flush=True)
    return time.perf_counter()


class ProvingAssignment(ConstraintSystem):
    """Witness-side synthesis (prover.rs:84-190).

    Unlike the reference (whose compiled-Rust ``enforce`` eagerly
    evaluates the three LinearCombinations), ``enforce`` here only
    RECORDS term structure — or, when the circuit's constraint matrices
    are already compiled (``groth16.witness``), just counts.  The actual
    a/b/c evaluation happens afterwards as one vectorized matrix-vector
    product per matrix; a python-int interpreter walking ~30M terms per
    Sprout proof was the dominant wall-clock cost."""

    def __init__(self, modulus: int, record: bool = True):
        super().__init__()
        self.modulus = modulus
        self.input_assignment = []
        self.aux_assignment = []
        self.term_rows = []  # [(a_terms, b_terms, c_terms)] when recording
        self.n_constraints = 0
        self._record = record
        self.alloc_input("one", lambda: 1)

    def alloc(self, name, f):
        v = f()
        if v is None:
            raise SynthesisError(f"missing assignment: {self.path_name(name)}")
        self.aux_assignment.append(int(v) % self.modulus)
        return Variable("aux", len(self.aux_assignment) - 1)

    def alloc_input(self, name, f):
        v = f()
        if v is None:
            raise SynthesisError(f"missing input: {self.path_name(name)}")
        self.input_assignment.append(int(v) % self.modulus)
        return Variable("input", len(self.input_assignment) - 1)

    def enforce(self, name, a, b, c):
        self.n_constraints += 1
        if self._record:
            self.term_rows.append((a.terms, b.terms, c.terms))

    def eval_abc(self):
        """Python-int a/b/c evaluation from the recorded terms, including
        the input consistency rows — the slow path for engines without
        device scalars (and the oracle the device SpMV is tested
        against)."""
        p = self.modulus
        inp, aux = self.input_assignment, self.aux_assignment
        a_v, b_v, c_v = [], [], []
        for a_t, b_t, c_t in self.term_rows:
            for terms, out in ((a_t, a_v), (b_t, b_v), (c_t, c_v)):
                acc = 0
                for v, c in terms:
                    acc += c * (inp[v.index] if v.kind == "input"
                                else aux[v.index])
                out.append(acc % p)
        for v in inp:
            a_v.append(v)
            b_v.append(0)
            c_v.append(0)
        return a_v, b_v, c_v


def create_proof(engine, circuit, params: Parameters, r: int, s: int) -> Proof:
    """create_proof (prover.rs:205-364) with explicit blinding r, s."""
    p = engine.r
    last_timings.clear()
    t_start = time.perf_counter()
    t0 = time.perf_counter()
    device_scalars = getattr(engine, "supports_device_scalars", False)
    struct_key = None
    compiled = None
    tape = None
    if device_scalars:
        sk = getattr(circuit, "structure_key", None)
        if sk is not None:
            struct_key = f"{engine.name}-{sk()}"
            compiled = witness.get_structure(struct_key)
            if wtape.traceable(circuit):
                tape = wtape.get_tape(struct_key)
                if tape is not None and compiled is not None and (
                        tape.n_constraints != compiled.n_constraints
                        or tape.n_inputs != compiled.n_inputs
                        or tape.n_vars != compiled.n_vars):
                    tape = None  # stale tape: re-trace below

    prover = None
    asg_arr = None  # canonical int16 limb array [n_vars, L] (device path)
    asg_bits = asg_nonbit = None  # bit-plan split upload (large circuits)
    if device_scalars and tape is not None:
        # Compiled-speed witness synthesis: replay the recorded tape over
        # this proof's leaves in native code (the reference's witness-gen
        # is compiled Rust inside create_proof, prover.rs:84-190,226).
        plan = tape.bit_plan()
        if tape.n_vars >= (1 << 19) and len(plan[0]) > 4 * len(plan[1]):
            # bit-dominated circuit (Sprout): upload 1 bit per boolean
            # wire + a small sidecar instead of 18 B of limbs per wire
            asg_arr, asg_bits, asg_nonbit = tape.run_split(
                circuit.witness_leaves())
        else:
            asg_arr = tape.run(circuit.witness_leaves())
        n_constraints = tape.n_constraints
        n_in = tape.n_inputs
        n_vars = tape.n_vars
    elif device_scalars and wtape.traceable(circuit):
        # Cache miss: one traced synthesize builds the tape (and the LC
        # terms when the compiled R1CS is also missing) — the walk that
        # used to run per proof now runs once per shape.
        tape, ta = wtape.trace_circuit(circuit,
                                       record_terms=compiled is None)
        wtape.put_tape(struct_key, tape)
        asg_arr = tape.run(circuit.witness_leaves())
        n_constraints = tape.n_constraints
        n_in = tape.n_inputs
        n_vars = tape.n_vars
        if compiled is None:
            compiled = witness.compile_structure(
                ta.term_rows, n_constraints, n_in, n_vars, p)
            witness.put_structure(struct_key, compiled)
    else:
        prover = ProvingAssignment(p, record=compiled is None)
        # Pause the cycle collector for the gadget walk: synthesis
        # allocates millions of short-lived tuples/LCs and gc passes are
        # a measurable slice of the wall time.
        import gc

        gc_was = gc.isenabled()
        gc.disable()
        try:
            circuit.synthesize(prover)
        finally:
            if gc_was:
                gc.enable()
        n_constraints = prover.n_constraints
        n_in = len(prover.input_assignment)
        n_vars = n_in + len(prover.aux_assignment)
    t0 = _t("synthesis", t0)

    vk = params.vk

    # Subversion-CRS guard (prover.rs:320-324).
    if vk.delta_g1 is None or vk.delta_g2 is None:
        raise SynthesisError("unexpected identity delta")

    # H(x) (prover.rs:256-283).  Rows = constraints + the input
    # consistency constraints (prover.rs:228-234, compiled into the A
    # matrix / appended by eval_abc).
    n_rows = n_constraints + n_in
    m = 1
    while m < n_rows:
        m *= 2
    domain = engine.domain(m)

    if device_scalars:
        # Device-resident pipeline: the assignment uploads ONCE as
        # canonical int16 limbs; a/b/c evaluate on device as compiled
        # sparse matrix-vector products over Fr (groth16.witness); H(x)
        # stays on device and its canonical digit array feeds the MSM
        # digit decomposition directly — no python-int round trip
        # anywhere between synthesis and the MSMs.
        import numpy as np

        import jax.numpy as jnp

        from ..ops import field as Ff

        from ..utils.limbs import pack_limbs_bytes, unpack_limbs_bytes

        if asg_arr is None:
            assignment = prover.input_assignment + prover.aux_assignment
            asg_arr = Ff.batch_to_limbs(Ff.FR, assignment,
                                        mont=False).astype(np.int16)
        if asg_bits is not None:
            # bit-plan upload: ~1 bit/wire + sidecar (Sprout: 79 MB ->
            # <1 MB); wire order restored on device with one gather
            perm_dev = _perm_dev_cache.get(id(tape))
            if perm_dev is None:
                if len(_perm_dev_cache) > 4:
                    _perm_dev_cache.clear()
                perm_dev = jnp.asarray(tape.bit_plan()[2])
                _perm_dev_cache[id(tape)] = perm_dev
            asg_dev = _get_expand()(
                jnp.asarray(np.packbits(asg_bits)),
                jnp.asarray(pack_limbs_bytes(asg_nonbit)),
                perm_dev, n_bits=len(asg_bits))
        else:
            # densest full-wire form: 2 limbs per 3 bytes, unpacked on
            # device — the assignment is the proof's one big upload
            asg_dev = _get_unpack()(jnp.asarray(pack_limbs_bytes(asg_arr)))
        aux_dev = asg_dev[n_in:]
        t0 = _t("pack/upload", t0)
        if compiled is None or (
                compiled.n_constraints != n_constraints
                or compiled.n_inputs != n_in
                or compiled.n_vars != n_vars):
            if prover is None or not prover.term_rows:
                # stale cached shape: resynthesize with term recording
                prover = ProvingAssignment(p, record=True)
                circuit.synthesize(prover)
            compiled = witness.compile_structure(
                prover.term_rows, n_constraints, n_in, n_vars, p)
            witness.put_structure(struct_key, compiled)
            t0 = _t("compile r1cs", t0)
        a_m, b_m, c_m = compiled.eval3(asg_dev, m)
        t0 = _t("spmv (a,b,c)", t0)
        h_scal = domain.h_poly_dev_canon(a_m, b_m, c_m)
        t0 = _t("fft (h poly)", t0)
        # Dispatch all 5 MSMs before resolving any (the reference enqueues
        # its 8 MSM futures before the first .wait(), prover.rs:289-353):
        # the device pipelines the bucket sweeps and the host pays one
        # readback latency per point instead of one full round trip per
        # dispatch+sync pair.  The l/a/b MSMs also hand the engine the
        # host limb array — with the hybrid split on, their top windows
        # run on native host threads during the device sweeps (the h
        # scalars only exist on device, so h stays all-device).
        p_h = engine.msm_g1_async(params.h, h_scal)
        p_l = engine.msm_g1_async(params.l, aux_dev,
                                  host_limbs=asg_arr[n_in:])
        p_a = engine.msm_g1_async(params.a, asg_dev, host_limbs=asg_arr)
        p_b1 = engine.msm_g1_async(params.b_g1, asg_dev,
                                   host_limbs=asg_arr)
        p_b2 = engine.msm_g2_async(params.b_g2, asg_dev,
                                   host_limbs=asg_arr)
        t0 = _t("msm dispatch", t0)
        resolvers = [p_h, p_l, p_a, p_b1, p_b2]
        if all(hasattr(r, "packed_dev") for r in resolvers):
            # ONE device->host transfer for all five packed results: a
            # separate ~100-byte readback per MSM costs a full tunnel
            # round trip (~20-30 ms each) of pure latency
            flats = [r.packed_dev.reshape(-1) for r in resolvers]
            sizes = [int(f.shape[0]) for f in flats]
            big = np.asarray(jnp.concatenate(flats))
            t0 = _t("msm readback", t0)
            outs = []
            off = 0
            for res, sz, lab in zip(resolvers, sizes,
                                    ("h", "l", "a", "b_g1", "b_g2")):
                outs.append(res.finish(big[off:off + sz]))
                off += sz
                t0 = _t(f"msm {lab}", t0)
            h, l, a_all, b1_all, b2_all = outs
        else:
            h = p_h()
            t0 = _t("msm h", t0)
            l = p_l()
            t0 = _t("msm l", t0)
            a_all = p_a()
            t0 = _t("msm a", t0)
            b1_all = p_b1()
            t0 = _t("msm b_g1", t0)
            b2_all = p_b2()
            t0 = _t("msm b_g2", t0)
    else:
        assignment = prover.input_assignment + prover.aux_assignment
        a_v, b_v, c_v = prover.eval_abc()
        h_coeffs = domain.h_poly(a_v, b_v, c_v)
        t0 = _t("fft (h poly)", t0)

        # The 8 MSMs (prover.rs:289-318) — dense bases, zero scalars
        # skipped by the MSM's digit-0 path instead of DensityTracker
        # compaction.
        h = engine.msm_g1(params.h, h_coeffs)
        t0 = _t("msm h", t0)
        l = engine.msm_g1(params.l, prover.aux_assignment)
        t0 = _t("msm l", t0)
        a_all = engine.msm_g1(params.a, assignment)
        t0 = _t("msm a", t0)
        b1_all = engine.msm_g1(params.b_g1, assignment)
        t0 = _t("msm b_g1", t0)
        b2_all = engine.msm_g2(params.b_g2, assignment)
        t0 = _t("msm b_g2", t0)

    # Blinding algebra (prover.rs:326-354).  The delta muls are against
    # per-CRS constants — comb-table fixed-base when the engine has one
    # (BlsEngine.g1_mul_fixed); g_a/g_b1 are per-proof points (wNAF).
    mulf1 = getattr(engine, "g1_mul_fixed", engine.g1_mul)
    mulf2 = getattr(engine, "g2_mul_fixed", engine.g2_mul)
    g_a = engine.g1_add(
        engine.g1_add(vk.alpha_g1, mulf1(vk.delta_g1, r)), a_all
    )
    g_b = engine.g2_add(
        engine.g2_add(vk.beta_g2, mulf2(vk.delta_g2, s)), b2_all
    )
    g_b1 = engine.g1_add(
        engine.g1_add(vk.beta_g1, mulf1(vk.delta_g1, s)), b1_all
    )
    g_c = engine.g1_add(
        engine.g1_add(
            engine.g1_add(engine.g1_mul(g_a, s), engine.g1_mul(g_b1, r)),
            mulf1(vk.delta_g1, (-r * s) % p),
        ),
        engine.g1_add(h, l),
    )
    _t("blinding", t0)
    last_timings["total"] = time.perf_counter() - t_start
    return Proof(a=g_a, b=g_b, c=g_c)


def create_random_proof(engine, circuit, params: Parameters,
                        rng: Optional[random.Random] = None) -> Proof:
    """create_random_proof (prover.rs:192-203)."""
    rng = rng or random.Random()
    return create_proof(
        engine, circuit, params,
        r=rng.randrange(engine.r), s=rng.randrange(engine.r),
    )
