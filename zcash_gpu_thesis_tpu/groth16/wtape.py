"""Witness-tape tracing, persistence and native replay.

Companion to :mod:`zcash_gpu_thesis_tpu.wv` (see its docstring for the
design).  This module owns the Groth16-facing pieces:

* :class:`TraceAssignment` — a ``ConstraintSystem`` that runs the gadget
  walk over ``wv.TV`` trace nodes, binding every allocated wire to its
  tape slot (and optionally recording LC terms for the compiled-R1CS
  build, so one traced synthesize serves both caches);
* tape persistence in the params directory (same lifecycle as the
  compiled-R1CS structures in :mod:`.witness`, with the same
  format-version + content-digest guard);
* per-proof replay: native C++ interpreter
  (``native/zktpu_native.cpp:zktpu_tape_run``) emitting the canonical
  12-bit-limb assignment array directly, with a python-int fallback.

Reference bar: bellman's witness generation is compiled Rust inside
``create_proof`` (``prover.rs:84-190,226``) and costs milliseconds; the
tape replay is this framework's equivalent.
"""

from __future__ import annotations

import os

import numpy as np

from .. import wv
from ..constants import FR_LIMBS, LIMB_BITS, R
from .r1cs import ConstraintSystem, SynthesisError, Variable

FORMAT_VERSION = 2  # v2: depth-sorted ops (adjacent INVs batch-invert)


class TraceAssignment(ConstraintSystem):
    """Synthesis over trace nodes: allocations bind wires to tape slots;
    ``enforce`` counts (and optionally records terms)."""

    def __init__(self, tape: wv.Tape, record_terms: bool = False):
        super().__init__()
        self.tape = tape
        self.n_constraints = 0
        self.term_rows = []
        self._record = record_terms
        self.alloc_input("one", lambda: 1)

    def _slot(self, v) -> int:
        if wv.is_tv(v):
            return v.i
        return self.tape.const(int(v) % R)

    def alloc(self, name, f):
        v = f()
        if v is None:
            raise SynthesisError(f"missing assignment: {self.path_name(name)}")
        self.tape.aux_slots.append(self._slot(v))
        return Variable("aux", len(self.tape.aux_slots) - 1)

    def alloc_input(self, name, f):
        v = f()
        if v is None:
            raise SynthesisError(f"missing input: {self.path_name(name)}")
        self.tape.input_slots.append(self._slot(v))
        return Variable("input", len(self.tape.input_slots) - 1)

    def enforce(self, name, a, b, c):
        self.n_constraints += 1
        if self._record:
            self.term_rows.append((a.terms, b.terms, c.terms))


class CompiledTape:
    """Finalized (array-form) witness tape for one circuit shape."""

    def __init__(self, op, a, b, c, aux, consts, n_leaves, input_slots,
                 aux_slots, n_constraints):
        self.op = op            # [n_ops] uint8
        self.a = a              # [n_ops] int32
        self.b = b
        self.c = c
        self.aux = aux          # [n_ops] int16 (bit index / shift)
        self.consts = consts    # [n_consts, 4] uint64 little-endian
        self.n_leaves = int(n_leaves)
        self.input_slots = input_slots  # [n_in] int32
        self.aux_slots = aux_slots      # [n_aux] int32
        self.n_constraints = int(n_constraints)

    @property
    def n_inputs(self):
        return len(self.input_slots)

    @property
    def n_vars(self):
        return len(self.input_slots) + len(self.aux_slots)

    # -- bit plan -------------------------------------------------------------

    def bit_plan(self):
        """(bit_slots, nonbit_slots, perm): a shape-level split of the
        wire vector into provably-{0,1} wires and the rest.

        Sprout's 2.2M wires are ~99% booleans (SHA256 gadgets); uploading
        18 bytes of packed limbs per bit-valued wire is ~100x its
        information content.  With this plan the proof uploads 1 bit per
        boolean wire plus a small non-boolean sidecar, and the device
        rebuilds wire order with one gather over ``perm``
        (rustzcash.rs:945-1090 is the reference entry this serves).

        Bitness is a forward dataflow lattice over the tape: ops that
        produce {0,1} by construction seed it, SELECT/XOR/AND/OR
        propagate it.  Cached after the first call.
        """
        if getattr(self, "_bit_plan", None) is None:
            from .. import wv

            op = self.op
            bit = np.zeros(len(op), bool)
            bit |= np.isin(op, (wv.BIT, wv.ANDN, wv.NOR, wv.NOT1,
                                wv.ISNZ))
            if len(self.consts):
                cvals = (self.consts[:, 0] <= 1) & (
                    self.consts[:, 1:] == 0).all(axis=1)
                is_const = op == wv.CONST
                bit[is_const] = cvals[self.a[is_const]]
            prop2 = np.isin(op, (wv.LXOR, wv.LAND, wv.LOR))
            prop3 = op == wv.SELECT
            # forward DAG: iterate to fixpoint (chain depth is small)
            while True:
                nxt = bit.copy()
                nxt[prop2] = bit[self.a[prop2]] & bit[self.b[prop2]]
                nxt[prop3] = bit[self.a[prop3]] & bit[self.b[prop3]]
                if np.array_equal(nxt, bit):
                    break
                bit = nxt
            wires = np.concatenate([self.input_slots, self.aux_slots])
            is_bit = bit[wires]
            bit_w = np.nonzero(is_bit)[0].astype(np.int32)
            nonbit_w = np.nonzero(~is_bit)[0].astype(np.int32)
            perm = np.empty(len(wires), np.int32)
            perm[bit_w] = np.arange(len(bit_w), dtype=np.int32)
            perm[nonbit_w] = len(bit_w) + np.arange(len(nonbit_w),
                                                    dtype=np.int32)
            self._bit_plan = (wires[bit_w].astype(np.int32),
                              wires[nonbit_w].astype(np.int32), perm)
        return self._bit_plan

    @staticmethod
    def from_trace(tape: wv.Tape, n_constraints: int) -> "CompiledTape":
        consts = np.zeros((len(tape.consts), 4), np.uint64)
        for i, v in enumerate(tape.consts):
            for k in range(4):
                consts[i, k] = (v >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
        ct = CompiledTape(
            np.asarray(tape.op, np.uint8), np.asarray(tape.a, np.int32),
            np.asarray(tape.b, np.int32), np.asarray(tape.c, np.int32),
            np.asarray(tape.aux, np.int16), consts, tape.n_leaves,
            np.asarray(tape.input_slots, np.int32),
            np.asarray(tape.aux_slots, np.int32), n_constraints)
        ct._depth_sort()
        return ct

    def _depth_sort(self):
        """Topologically re-sort the ops by dependency depth (stable;
        INVs first within a depth level).  Any depth order is a valid
        execution order — operands always sit at strictly smaller depth
        — and it makes mutually independent inversions ADJACENT, so the
        native replay runs them as one Montgomery batch inversion
        (3 muls/element + one EGCD per run) instead of one EGCD each.
        The EGCD was ~85% of the Spend replay: ~7.6k inversions from the
        pedersen/edwards chains, ~8 independent per level (the hash's
        parallel segments)."""
        op, a, b, c = self.op, self.a, self.b, self.c
        n = len(op)
        una = np.isin(op, (wv.NEG, wv.INV, wv.BIT, wv.NOT1, wv.SHR,
                           wv.ROTR32, wv.ISNZ, wv.MASK64))
        binr = np.isin(op, (wv.ADD, wv.SUB, wv.MUL, wv.LXOR, wv.LAND,
                            wv.ANDN, wv.NOR, wv.LOR))
        tern = np.isin(op, (wv.SELECT, wv.CH32, wv.MAJ32))
        use_a = una | binr | tern
        use_b = binr | tern
        use_c = tern
        oplist = op.tolist()
        al, bl, cl = a.tolist(), b.tolist(), c.tolist()
        ual, ubl, ucl = use_a.tolist(), use_b.tolist(), use_c.tolist()
        dl = [0] * n       # plain dependency depth (topological tiebreak)
        il = [0] * n       # INV-chain depth: INV count on the longest path
        INV = wv.INV
        for i in range(n):
            d = v = 0
            if ual[i]:
                j = al[i]
                d, v = dl[j] + 1, il[j]
                if ubl[i]:
                    j = bl[i]
                    if dl[j] + 1 > d:
                        d = dl[j] + 1
                    if il[j] > v:
                        v = il[j]
                if ucl[i]:
                    j = cl[i]
                    if dl[j] + 1 > d:
                        d = dl[j] + 1
                    if il[j] > v:
                        v = il[j]
            if oplist[i] == INV:
                v += 1
            dl[i] = d
            il[i] = v
        depth = np.asarray(dl, np.int32)
        invd = np.asarray(il, np.int32)
        # (inv-depth, non-INV flag, depth, index) is a topological order
        # — inv-depth and depth are both monotone along edges, and an
        # INV's operand has strictly smaller inv-depth — that makes each
        # inv-level's (mutually independent) inversions CONTIGUOUS
        not_inv = (op != wv.INV).astype(np.int8)
        order = np.lexsort((np.arange(n), depth, not_inv, invd))
        new_index = np.empty(n, np.int32)
        new_index[order] = np.arange(n, dtype=np.int32)
        self.op = op[order]
        self.aux = self.aux[order]
        ra = a[order].copy()
        rb = b[order].copy()
        rc = c[order].copy()
        ra[use_a[order]] = new_index[a[order][use_a[order]]]
        rb[use_b[order]] = new_index[b[order][use_b[order]]]
        rc[use_c[order]] = new_index[c[order][use_c[order]]]
        self.a, self.b, self.c = ra, rb, rc
        self.input_slots = new_index[self.input_slots]
        self.aux_slots = new_index[self.aux_slots]

    # -- replay --------------------------------------------------------------

    def _leaf_words(self, leaves) -> np.ndarray:
        if len(leaves) != self.n_leaves:
            raise SynthesisError(
                f"tape expects {self.n_leaves} leaves, got {len(leaves)}")
        out = np.zeros((len(leaves), 4), np.uint64)
        for i, v in enumerate(leaves):
            v = int(v)  # raw — byte-string leaves are 256-bit (wv.Tape.leaf)
            for k in range(4):
                out[i, k] = (v >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
        return out

    def run(self, leaves) -> np.ndarray:
        """Replay over fresh leaf values -> canonical int16 limb array
        [n_vars, FR_LIMBS] (inputs first), via the native interpreter
        when available."""
        from .. import native as NV

        if NV.available() and hasattr(NV.lib(), "zktpu_tape_run"):
            return self._run_native(leaves)
        return self._run_py(leaves)

    def _run_native(self, leaves) -> np.ndarray:
        import ctypes

        from .. import native as NV

        l = NV.lib()
        slots = np.concatenate([self.input_slots, self.aux_slots])
        out = np.empty((len(slots), FR_LIMBS), np.int16)
        leaf_w = np.ascontiguousarray(self._leaf_words(leaves))
        rc = l.zktpu_tape_run(
            self.op.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.aux.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            ctypes.c_size_t(len(self.op)),
            self.consts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            ctypes.c_size_t(self.consts.shape[0]),
            leaf_w.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            ctypes.c_size_t(leaf_w.shape[0]),
            slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_size_t(len(slots)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        )
        if rc != 0:
            raise SynthesisError("tape replay: division by zero "
                                 "(invalid witness)")
        return out

    def run_split(self, leaves, full: bool = True):
        """Replay with the bit-plan split outputs: (full_limbs | None,
        bits uint8 [n_bit], nonbit_limbs int16 [n_nonbit, L]).  The
        bit/nonbit pair is the dense upload form for bit-dominated
        circuits; ``full`` additionally materializes the whole wire limb
        array host-side (the hybrid MSM host windows consume it — cheap
        memory, the saving is the transfer)."""
        import ctypes

        from .. import native as NV

        bit_slots, nonbit_slots, _ = self.bit_plan()
        l = NV.lib() if NV.available() else None
        if l is None or not hasattr(l, "zktpu_tape_run_split"):
            tape = self._as_wv_tape()
            vals, zdiv = wv.replay_py(tape, leaves)
            if zdiv:
                raise SynthesisError("tape replay: division by zero")
            from ..utils.limbs import ints_to_limbs_fast

            bits = np.asarray([vals[s] for s in bit_slots], np.uint8)
            nonbit = ints_to_limbs_fast(
                [vals[s] for s in nonbit_slots], FR_LIMBS).astype(np.int16)
            full_l = None
            if full:
                slots = np.concatenate([self.input_slots, self.aux_slots])
                full_l = ints_to_limbs_fast(
                    [vals[s] for s in slots], FR_LIMBS).astype(np.int16)
            return full_l, bits, nonbit

        slots = np.concatenate([self.input_slots, self.aux_slots])
        full_l = np.empty((len(slots), FR_LIMBS), np.int16) if full else None
        bits = np.empty(len(bit_slots), np.uint8)
        nonbit = np.empty((len(nonbit_slots), FR_LIMBS), np.int16)
        leaf_w = np.ascontiguousarray(self._leaf_words(leaves))

        def p(arr, ty):
            return arr.ctypes.data_as(ctypes.POINTER(ty))

        rc = l.zktpu_tape_run_split(
            p(self.op, ctypes.c_uint8), p(self.a, ctypes.c_int32),
            p(self.b, ctypes.c_int32), p(self.c, ctypes.c_int32),
            p(self.aux, ctypes.c_int16), ctypes.c_size_t(len(self.op)),
            p(self.consts, ctypes.c_uint64),
            ctypes.c_size_t(self.consts.shape[0]),
            p(leaf_w, ctypes.c_uint64), ctypes.c_size_t(leaf_w.shape[0]),
            p(slots, ctypes.c_int32), ctypes.c_size_t(len(slots)),
            (p(full_l, ctypes.c_int16) if full else
             ctypes.cast(None, ctypes.POINTER(ctypes.c_int16))),
            p(bit_slots, ctypes.c_int32), ctypes.c_size_t(len(bit_slots)),
            p(bits, ctypes.c_uint8),
            p(nonbit_slots, ctypes.c_int32),
            ctypes.c_size_t(len(nonbit_slots)),
            p(nonbit, ctypes.c_int16),
        )
        if rc != 0:
            raise SynthesisError("tape replay: division by zero "
                                 "(invalid witness)")
        return full_l, bits, nonbit

    def _as_wv_tape(self) -> wv.Tape:
        tape = wv.Tape()
        tape.op = self.op.tolist()
        tape.a = self.a.tolist()
        tape.b = self.b.tolist()
        tape.c = self.c.tolist()
        tape.aux = self.aux.tolist()
        tape.consts = [int(sum(int(w) << (64 * k)
                               for k, w in enumerate(row)))
                       for row in self.consts]
        tape.n_leaves = self.n_leaves
        return tape

    def _run_py(self, leaves) -> np.ndarray:
        from ..utils.limbs import ints_to_limbs_fast

        vals, zdiv = wv.replay_py(self._as_wv_tape(), leaves)
        if zdiv:
            raise SynthesisError("tape replay: division by zero "
                                 "(invalid witness)")
        slots = np.concatenate([self.input_slots, self.aux_slots])
        return ints_to_limbs_fast([vals[s] for s in slots],
                                  FR_LIMBS).astype(np.int16)

    def values(self, leaves):
        """Python-int wire values (input list, aux list) — the oracle
        path for tests and for engines that want plain ints."""
        vals, zdiv = wv.replay_py(self._as_wv_tape(), leaves)
        if zdiv:
            raise SynthesisError("tape replay: division by zero")
        return ([vals[s] for s in self.input_slots],
                [vals[s] for s in self.aux_slots])

    # -- persistence ---------------------------------------------------------

    def save(self, path: str):
        from .witness import _content_digest

        arrs = {"op": self.op, "a": self.a, "b": self.b, "c": self.c,
                "aux": self.aux, "consts": self.consts,
                "input_slots": self.input_slots,
                "aux_slots": self.aux_slots,
                "meta": np.asarray([FORMAT_VERSION, self.n_leaves,
                                    self.n_constraints], np.int64)}
        arrs["digest"] = _content_digest(arrs)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez_compressed(f, **arrs)
        os.replace(tmp, path)

    @staticmethod
    def load(path: str) -> "CompiledTape":
        from .witness import _content_digest

        z = np.load(path)
        ver, n_leaves, n_constraints = (int(x) for x in z["meta"])
        if ver != FORMAT_VERSION:
            raise ValueError(f"{path}: unsupported tape format {ver}")
        expect = _content_digest(
            {k: z[k] for k in z.files if k != "digest"})
        if not np.array_equal(expect, z["digest"]):
            raise ValueError(f"{path}: tape digest mismatch")
        return CompiledTape(z["op"], z["a"], z["b"], z["c"], z["aux"],
                            z["consts"], n_leaves, z["input_slots"],
                            z["aux_slots"], n_constraints)


def trace_circuit(circuit, record_terms: bool = False):
    """Run one traced synthesize: returns (CompiledTape, TraceAssignment).

    The circuit must implement ``witness_leaves`` / ``with_leaves``
    (Sapling Spend/Output, Sprout JoinSplit); the TraceAssignment carries
    ``term_rows`` when ``record_terms`` so the compiled-R1CS structure
    can be built from the same walk."""
    tape = wv.Tape()
    leaves = circuit.witness_leaves()
    tvs = tape.leaves(leaves)
    traced = circuit.with_leaves(tvs)
    ta = TraceAssignment(tape, record_terms=record_terms)
    import gc

    gc_was = gc.isenabled()
    gc.disable()
    try:
        traced.synthesize(ta)
    finally:
        if gc_was:
            gc.enable()
    return CompiledTape.from_trace(tape, ta.n_constraints), ta


def traceable(circuit) -> bool:
    return (hasattr(circuit, "witness_leaves")
            and hasattr(circuit, "with_leaves"))


# -- cache (mirrors witness.get_structure/put_structure) ---------------------

_cache: dict = {}


def _disk_path(key: str):
    from .witness import _disk_path as wd

    p = wd(key)
    if p is None:
        return None
    return p.replace("compiled-r1cs-", "wtape-")


def get_tape(key):
    if not key:
        return None
    hit = _cache.get(key)
    if hit is not None:
        return hit
    path = _disk_path(key)
    if path and os.path.exists(path):
        try:
            hit = CompiledTape.load(path)
        except Exception:
            return None
        _cache[key] = hit
        return hit
    return None


def put_tape(key, tape: CompiledTape):
    if not key:
        return
    _cache[key] = tape
    path = _disk_path(key)
    if path:
        try:
            tape.save(path)
        except OSError:
            pass
