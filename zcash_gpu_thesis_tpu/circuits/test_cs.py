"""TestConstraintSystem — named-constraint interpreter for circuit tests.

Re-design of ``circuit/test/mod.rs``: records every constraint with its
namespaced path, evaluates satisfaction, exposes get/set by path, and
computes the blake2s **hash of the entire constraint system shape**
(test/mod.rs:232-255) — the mechanism that pins Sprout to its circuit-hash
golden (circuit/sprout/mod.rs:465-467).
"""

from __future__ import annotations

import hashlib

from ..constants import R as FR
from ..groth16.r1cs import ONE, ConstraintSystem, LinearCombination, Variable


def _proc_lc(lc: LinearCombination):
    """Accumulate + sort (inputs before aux, by index), drop zeros."""
    acc = {}
    for var, coeff in lc.terms:
        key = (0 if var.kind == "input" else 1, var.index)
        acc[key] = (acc.get(key, 0) + coeff) % FR
    return [(k, v) for k, v in sorted(acc.items()) if v != 0]


class TestConstraintSystem(ConstraintSystem):
    def __init__(self):
        super().__init__()
        self.named_objects = {"ONE": ONE}
        self.constraints = []  # (a, b, c, path)
        self.inputs = [(1, "ONE")]
        self.aux = []

    # -- allocation ---------------------------------------------------------

    def _register(self, path, obj):
        assert path not in self.named_objects, f"duplicate name: {path}"
        self.named_objects[path] = obj

    def alloc(self, name, f):
        path = self.path_name(name)
        v = f()
        self.aux.append((0 if v is None else int(v) % FR, path))
        var = Variable("aux", len(self.aux) - 1)
        self._register(path, var)
        return var

    def alloc_input(self, name, f):
        path = self.path_name(name)
        v = f()
        self.inputs.append((0 if v is None else int(v) % FR, path))
        var = Variable("input", len(self.inputs) - 1)
        self._register(path, var)
        return var

    def enforce(self, name, a, b, c):
        path = self.path_name(name)
        self._register(path, len(self.constraints))
        self.constraints.append((a, b, c, path))

    # -- inspection ---------------------------------------------------------

    def _eval_lc(self, lc: LinearCombination) -> int:
        acc = 0
        for var, coeff in lc.terms:
            val = (
                self.inputs[var.index][0]
                if var.kind == "input"
                else self.aux[var.index][0]
            )
            acc += coeff * val
        return acc % FR

    def which_is_unsatisfied(self):
        for a, b, c, path in self.constraints:
            if self._eval_lc(a) * self._eval_lc(b) % FR != self._eval_lc(c):
                return path
        return None

    def is_satisfied(self) -> bool:
        return self.which_is_unsatisfied() is None

    def num_constraints(self) -> int:
        return len(self.constraints)

    def num_inputs(self) -> int:
        return len(self.inputs)

    def num_aux(self) -> int:
        return len(self.aux)

    def hash(self) -> str:
        """blake2s-256 of the constraint-system shape (test/mod.rs:232)."""
        h = hashlib.blake2s(digest_size=32)
        h.update(len(self.inputs).to_bytes(8, "big"))
        h.update(len(self.aux).to_bytes(8, "big"))
        h.update(len(self.constraints).to_bytes(8, "big"))
        for a, b, c, _ in self.constraints:
            for lc in (a, b, c):
                entries = _proc_lc(lc)
                h.update(len(entries).to_bytes(8, "big"))
                for (kind, idx), coeff in entries:
                    h.update(b"I" if kind == 0 else b"A")
                    h.update(idx.to_bytes(8, "big"))
                    h.update(coeff.to_bytes(32, "big"))
        return h.hexdigest()

    def set(self, path: str, to: int):
        var = self.named_objects[path]
        assert isinstance(var, Variable), f"not a variable: {path}"
        if var.kind == "input":
            self.inputs[var.index] = (to % FR, path)
        else:
            self.aux[var.index] = (to % FR, path)

    def get(self, path: str) -> int:
        var = self.named_objects[path]
        assert isinstance(var, Variable), f"not a variable: {path}"
        return (
            self.inputs[var.index][0]
            if var.kind == "input"
            else self.aux[var.index][0]
        )

    def get_input(self, index: int, path: str) -> int:
        assert self.inputs[index][1] == path, (self.inputs[index][1], path)
        return self.inputs[index][0]

    def verify(self, expected) -> bool:
        """Check public inputs (after ONE) match and all constraints hold."""
        if len(expected) + 1 != len(self.inputs):
            return False
        for (got, _), want in zip(self.inputs[1:], expected):
            if got != want % FR:
                return False
        return self.is_satisfied()
