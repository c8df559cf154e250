"""Witness-tape record/replay tests.

The tape (zcash_gpu_thesis_tpu/wv.py + groth16/wtape.py) is this
framework's analog of the reference's compiled witness generation
(bellman/src/groth16/prover.rs:84-190,226): the gadget walk records once
per circuit shape, then replays per proof in native code.  Oracle
ladder: interpreted gadget walk (ProvingAssignment) == traced-walk
values == python tape replay == native tape replay.
"""

import random

import numpy as np
import pytest

from zcash_gpu_thesis_tpu import native as NV
from zcash_gpu_thesis_tpu import wv
from zcash_gpu_thesis_tpu.circuits.sapling import Output, Spend, TREE_DEPTH
from zcash_gpu_thesis_tpu.constants import R as FR
from zcash_gpu_thesis_tpu.groth16 import wtape
from zcash_gpu_thesis_tpu.groth16.prover import ProvingAssignment
from zcash_gpu_thesis_tpu.groth16.r1cs import SynthesisError
from zcash_gpu_thesis_tpu.protocol import jubjub as J
from zcash_gpu_thesis_tpu.protocol import primitives as P


def _spend_witness(seed):
    rng = random.Random(seed)
    vc = P.ValueCommitment(value=rng.randrange(1, 1 << 64),
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
    return Spend(
        value_commitment=vc, proof_generation_key=pgk,
        payment_address=addr,
        commitment_randomness=rng.randrange(J.FS),
        ar=rng.randrange(J.FS),
        auth_path=[(rng.randrange(FR), bool(rng.getrandbits(1)))
                   for _ in range(TREE_DEPTH)],
        anchor=rng.randrange(FR),
    )


def _output_witness(seed):
    rng = random.Random(seed)
    vc = P.ValueCommitment(value=rng.randrange(1, 1 << 64),
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
    return Output(value_commitment=vc, payment_address=addr,
                  commitment_randomness=rng.randrange(J.FS),
                  esk=rng.randrange(J.FS))


def _interp(circuit):
    pa = ProvingAssignment(FR, record=False)
    circuit.synthesize(pa)
    return pa


def test_wv_concrete_matches_traced():
    """Every wv op: concrete result == traced concrete value == python
    replay of the recorded op."""
    rng = random.Random(0x5DBE6259)
    xs = [rng.randrange(FR) for _ in range(4)]
    bits = [rng.randrange(2) for _ in range(4)]
    words = [rng.randrange(1 << 32) for _ in range(3)]

    def both(fn):
        conc = fn(lambda v: v)
        t = wv.Tape()
        tvs = {}

        def tv_of(v):
            if v not in tvs:
                tvs[v] = t.leaf(t.n_leaves, v)
            return tvs[v]

        traced = fn(tv_of)
        assert wv.is_tv(traced), "op did not record"
        assert traced.v == conc
        leaves = sorted(tvs, key=lambda v: tvs[v].i)
        vals, zdiv = wv.replay_py(t, list(tvs.keys()))
        assert not zdiv
        assert vals[traced.i] == conc
        return conc

    both(lambda w: (w(xs[0]) + w(xs[1])) % FR)
    both(lambda w: (w(xs[0]) - w(xs[1])) % FR)
    both(lambda w: w(xs[0]) * w(xs[1]) % FR)
    both(lambda w: wv.neg(w(xs[0])))
    both(lambda w: wv.inv(w(xs[0])))
    both(lambda w: wv.bit(w(xs[0]), 137))
    both(lambda w: wv.select(w(bits[0]), w(xs[0]), w(xs[1])))
    both(lambda w: wv.xor(w(bits[0]), w(bits[1])))
    both(lambda w: wv.and_(w(bits[0]), w(bits[1])))
    both(lambda w: wv.andn(w(bits[0]), w(bits[1])))
    both(lambda w: wv.nor(w(bits[0]), w(bits[1])))
    both(lambda w: wv.not_(w(bits[0])))
    both(lambda w: wv.shr(w(words[0]), 7))
    both(lambda w: wv.rotr32(w(words[0]), 11))
    both(lambda w: wv.ch32(w(words[0]), w(words[1]), w(words[2])))
    both(lambda w: wv.maj32(w(words[0]), w(words[1]), w(words[2])))
    both(lambda w: wv.isnz(w(xs[0])))
    both(lambda w: wv.mask64(w(xs[0])))
    both(lambda w: wv.add_if(w(xs[0]), w(bits[0]), xs[1]))
    both(lambda w: wv.sel_table([w(bits[0]), w(bits[1]), w(bits[2])],
                                xs + xs[:4]))


def test_tv_refuses_branching():
    t = wv.Tape()
    x = t.leaf(0, 5)
    with pytest.raises(TypeError):
        bool(x)
    with pytest.raises(TypeError):
        int(x)


def test_spend_tape_matches_interpreted_walk():
    spend = _spend_witness(0x3DBE6259)
    pa = _interp(spend)
    tape, ta = wtape.trace_circuit(spend)
    assert ta.n_constraints == pa.n_constraints == 98777
    inp, aux = tape.values(spend.witness_leaves())
    assert inp == pa.input_assignment
    assert aux == pa.aux_assignment

    # a FRESH witness through the same cached tape
    spend2 = _spend_witness(1234)
    pa2 = _interp(spend2)
    inp2, aux2 = tape.values(spend2.witness_leaves())
    assert inp2 == pa2.input_assignment
    assert aux2 == pa2.aux_assignment


def test_output_tape_matches_interpreted_walk():
    out = _output_witness(7)
    pa = _interp(out)
    tape, ta = wtape.trace_circuit(out)
    assert ta.n_constraints == pa.n_constraints == 7827
    inp, aux = tape.values(out.witness_leaves())
    assert inp == pa.input_assignment
    assert aux == pa.aux_assignment


@pytest.mark.skipif(not NV.available(), reason="native library not built")
def test_native_replay_matches_python():
    out = _output_witness(42)
    tape, _ = wtape.trace_circuit(out)
    leaves = out.witness_leaves()
    assert np.array_equal(tape._run_native(leaves), tape._run_py(leaves))


def test_tape_persistence_roundtrip(tmp_path):
    out = _output_witness(3)
    tape, _ = wtape.trace_circuit(out)
    path = str(tmp_path / "wtape-test.npz")
    tape.save(path)
    loaded = wtape.CompiledTape.load(path)
    leaves = out.witness_leaves()
    assert np.array_equal(loaded._run_py(leaves), tape._run_py(leaves))

    # tampering must be rejected (same guard as the compiled R1CS)
    z = dict(np.load(path))
    z["aux_slots"] = z["aux_slots"].copy()
    z["aux_slots"][0] ^= 1
    with open(path, "wb") as f:
        np.savez_compressed(f, **z)
    with pytest.raises(ValueError):
        wtape.CompiledTape.load(path)


def test_run_split_matches_full():
    out = _output_witness(9)
    tape, _ = wtape.trace_circuit(out)
    leaves = out.witness_leaves()
    full = tape.run(leaves)
    full2, bits, nonbit = tape.run_split(leaves)
    assert np.array_equal(full2, full)
    assert bits.size and bits.max() <= 1
    bit_slots, nonbit_slots, perm = tape.bit_plan()
    rows = np.zeros((len(bits) + len(nonbit), full.shape[1]), np.int16)
    rows[: len(bits), 0] = bits
    rows[len(bits):] = nonbit
    assert np.array_equal(rows[perm], full)


def test_expand_jit_reconstructs_assignment():
    import jax.numpy as jnp

    from zcash_gpu_thesis_tpu.groth16.prover import _get_expand
    from zcash_gpu_thesis_tpu.utils.limbs import pack_limbs_bytes

    out = _output_witness(11)
    tape, _ = wtape.trace_circuit(out)
    leaves = out.witness_leaves()
    full = tape.run(leaves)
    _, bits, nonbit = tape.run_split(leaves, full=False)
    got = _get_expand()(
        jnp.asarray(np.packbits(bits)),
        jnp.asarray(pack_limbs_bytes(nonbit)),
        jnp.asarray(tape.bit_plan()[2]), n_bits=len(bits))
    assert np.array_equal(np.asarray(got), full)


def test_zero_division_flags_replay():
    t = wv.Tape()
    x = t.leaf(0, 0)
    wv.inv(x)  # traced inverse of a slot that will be zero at replay
    ct = wtape.CompiledTape.from_trace(t, 0)
    ct.input_slots = np.asarray([x.i], np.int32)
    ct.aux_slots = np.asarray([], np.int32)
    with pytest.raises(SynthesisError):
        ct._run_py([0])
    if NV.available():
        with pytest.raises(SynthesisError):
            ct._run_native([0])


def _sprout_witness(seed):
    """A valid JoinSplit witness: two dummy (value-0) inputs — the
    merkle root check is conditionally off for them — and two real
    outputs funded by vpub_old (examples/sprout_demo.py pattern)."""
    from zcash_gpu_thesis_tpu.circuits.sprout import (JoinSplit, JSInput,
                                                      JSOutput)
    from zcash_gpu_thesis_tpu.circuits.sprout import TREE_DEPTH as SPROUT_D
    from zcash_gpu_thesis_tpu.protocol import sprout as H

    rng = random.Random(seed)

    def rand32():
        return bytes(rng.randrange(256) for _ in range(32))

    phi, h_sig = rand32(), rand32()
    rt = H.uncommitted()
    for _ in range(SPROUT_D):
        rt = H.merkle_combine(rt, rt)
    sibling = H.uncommitted()
    path = [(sibling, False)] * SPROUT_D
    inputs = [JSInput(value=0, a_sk=rand32(), rho=rand32(), r=rand32(),
                      auth_path=list(path)) for _ in range(2)]
    out_value = [60_000, 40_000]
    outputs = [JSOutput(value=v, a_pk=H.prf_a_pk(rand32()), r=rand32())
               for v in out_value]
    return JoinSplit(vpub_old=sum(out_value), vpub_new=0, h_sig=h_sig,
                     phi=phi, inputs=inputs, outputs=outputs, rt=rt)


@pytest.mark.slow
def test_sprout_tape_matches_interpreted_walk():
    js = _sprout_witness(0x5DBE6259)
    pa = _interp(js)
    tape, ta = wtape.trace_circuit(js)
    assert ta.n_constraints == pa.n_constraints
    inp, aux = tape.values(js.witness_leaves())
    assert inp == pa.input_assignment
    assert aux == pa.aux_assignment
    if NV.available():
        leaves = js.witness_leaves()
        assert np.array_equal(tape._run_native(leaves),
                              tape._run_py(leaves))
