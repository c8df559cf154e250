"""Compiled constraint-system evaluation vs the python-int oracle.

The device SpMV (groth16/witness.py) replaces the reference's eager
per-enforce LinearCombination evaluation (prover.rs:130-174); these tests
pin it bit-exactly against the recorded-terms python evaluation across
adversarial structures: empty rows, single long LCs (the ~255-term boolean
packings), negative/huge/duplicate coefficients, rows spanning chunk
boundaries, and the real Sapling Output circuit.
"""

import random

import numpy as np
import pytest

from zcash_gpu_thesis_tpu.constants import R as FR_MOD
from zcash_gpu_thesis_tpu.groth16 import witness as W
from zcash_gpu_thesis_tpu.groth16.prover import ProvingAssignment
from zcash_gpu_thesis_tpu.groth16.r1cs import LinearCombination, Variable
from zcash_gpu_thesis_tpu.ops import field as Ff


def _eval_compiled(compiled, assignment, m):
    import jax.numpy as jnp

    z = jnp.asarray(
        Ff.batch_to_limbs(Ff.FR, assignment, mont=False).astype(np.int16))
    a, b, c = compiled.eval3(z, m)
    out = []
    for mat in (a, b, c):
        out.append(Ff.batch_from_limbs(Ff.FR, np.asarray(mat), mont=False))
    return out


def _check(term_rows, n_inputs, assignment, modulus=FR_MOD):
    n_constraints = len(term_rows)
    compiled = W.compile_structure(term_rows, n_constraints, n_inputs,
                                   len(assignment), modulus)
    n_rows = n_constraints + n_inputs
    m = 1
    while m < n_rows:
        m *= 2
    got_a, got_b, got_c = _eval_compiled(compiled, assignment, m)

    # oracle: plain python ints
    inp, aux = assignment[:n_inputs], assignment[n_inputs:]
    for mi, got in enumerate((got_a, got_b, got_c)):
        for r, terms3 in enumerate(term_rows):
            want = sum(
                c * (inp[v.index] if v.kind == "input" else aux[v.index])
                for v, c in terms3[mi]
            ) % modulus
            assert got[r] == want, (mi, r)
        # input consistency rows (A only)
        for j in range(n_inputs):
            want = inp[j] if mi == 0 else 0
            assert got[n_constraints + j] == want, (mi, j)
        for r in range(n_rows, m):
            assert got[r] == 0


def V(kind, i):
    return Variable(kind, i)


def test_spmv_small_random(rng):
    n_in, n_aux = 3, 40
    assignment = [1] + [rng.randrange(FR_MOD) for _ in range(n_in - 1 + n_aux)]
    term_rows = []
    for r in range(37):
        def mk():
            t = []
            for _ in range(rng.randrange(0, 6)):
                kind = rng.choice(["input", "aux"])
                idx = rng.randrange(n_in if kind == "input" else n_aux)
                coeff = rng.choice(
                    [1, -1, 2, -2, rng.randrange(FR_MOD),
                     -rng.randrange(FR_MOD), FR_MOD + 5])
                t.append((V(kind, idx), coeff))
            return t
        term_rows.append((mk(), mk(), mk()))
    _check(term_rows, n_in, assignment)


def test_spmv_long_lc_and_empty_rows(rng):
    """One 300-term LC (longer than Sapling's packings), many empty rows,
    duplicate variables within one LC."""
    n_in, n_aux = 2, 350
    assignment = [1, 7] + [rng.randrange(FR_MOD) for _ in range(n_aux)]
    long_terms = [(V("aux", i), rng.randrange(FR_MOD)) for i in range(300)]
    long_terms += [(V("aux", 0), 123), (V("aux", 0), FR_MOD - 1)]
    term_rows = [([], [], [])] * 5
    term_rows = list(term_rows)
    term_rows.append((long_terms, [(V("input", 1), 3)], []))
    term_rows.extend([([], [], [])] * 9)
    term_rows.append(([(V("aux", 5), -7)], [], long_terms[:50]))
    _check(term_rows, n_in, assignment)


def test_spmv_chunk_boundaries(rng):
    """Force multiple scan chunks with rows straddling the boundary
    (CHUNK temporarily shrunk)."""
    old = W.CHUNK
    W.CHUNK = 64
    try:
        n_in, n_aux = 1, 64
        assignment = [1] + [rng.randrange(FR_MOD) for _ in range(n_aux)]
        term_rows = []
        for r in range(50):
            n_t = rng.choice([0, 1, 3, 17])  # 17-term rows straddle 64
            t = [(V("aux", rng.randrange(n_aux)), rng.randrange(FR_MOD))
                 for _ in range(n_t)]
            term_rows.append((t, t[:2], [(V("input", 0), 1)]))
        _check(term_rows, n_in, assignment)
    finally:
        W.CHUNK = old


def test_prover_assignment_eval_abc_matches_compiled(rng):
    """ProvingAssignment's recorded terms -> eval_abc oracle == compiled
    device evaluation (the two paths create_proof can take)."""
    pa = ProvingAssignment(FR_MOD, record=True)
    vs = [pa.alloc(f"v{i}", lambda i=i: rng.randrange(FR_MOD))
          for i in range(20)]
    pub = pa.alloc_input("pub", lambda: 42)
    for r in range(15):
        a = LinearCombination([(rng.choice(vs), rng.randrange(FR_MOD))
                               for _ in range(rng.randrange(0, 4))])
        b = LinearCombination([(pub, rng.randrange(FR_MOD))])
        c = LinearCombination([(rng.choice(vs), -rng.randrange(FR_MOD))])
        pa.enforce(f"r{r}", a, b, c)
    a_v, b_v, c_v = pa.eval_abc()
    assignment = pa.input_assignment + pa.aux_assignment
    compiled = W.compile_structure(pa.term_rows, pa.n_constraints,
                                   len(pa.input_assignment),
                                   len(assignment), FR_MOD)
    m = 32
    got_a, got_b, got_c = _eval_compiled(compiled, assignment, m)
    assert got_a[:len(a_v)] == a_v
    assert got_b[:len(b_v)] == b_v
    assert got_c[:len(c_v)] == c_v


@pytest.mark.slow
def test_spmv_sapling_output_circuit(rng):
    """The real 7,827-constraint Output circuit: compiled evaluation ==
    python eval_abc, and the structure round-trips through save/load."""
    import os
    import tempfile

    from zcash_gpu_thesis_tpu.circuits.sapling import Output
    from zcash_gpu_thesis_tpu.protocol import jubjub as J
    from zcash_gpu_thesis_tpu.protocol import primitives as P

    vc = P.ValueCommitment(value=rng.randrange(1, 1 << 60),
                           randomness=rng.randrange(J.FS))
    ak = J.edwards_mul(
        J.JubjubParams().generator(J.SPENDING_KEY_GENERATOR),
        rng.randrange(J.FS))
    pgk = P.ProofGenerationKey(ak=ak, nsk=rng.randrange(J.FS))
    vk = pgk.into_viewing_key()
    while True:
        d = rng.randrange(1 << 88).to_bytes(11, "little")
        addr = vk.into_payment_address(d)
        if addr is not None:
            break
    circ = Output(value_commitment=vc, payment_address=addr,
                  commitment_randomness=rng.randrange(J.FS),
                  esk=rng.randrange(J.FS))

    pa = ProvingAssignment(FR_MOD, record=True)
    circ.synthesize(pa)
    a_v, b_v, c_v = pa.eval_abc()
    assignment = pa.input_assignment + pa.aux_assignment
    compiled = W.compile_structure(pa.term_rows, pa.n_constraints,
                                   len(pa.input_assignment),
                                   len(assignment), FR_MOD)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "s.npz")
        compiled.save(path)
        compiled = W.CompiledConstraints.load(path)
    n_rows = pa.n_constraints + len(pa.input_assignment)
    m = 1
    while m < n_rows:
        m *= 2
    got_a, got_b, got_c = _eval_compiled(compiled, assignment, m)
    assert got_a[:len(a_v)] == a_v
    assert got_b[:len(b_v)] == b_v
    assert got_c[:len(c_v)] == c_v
