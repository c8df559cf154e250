"""R1CS constraint-system core.

Python re-design of the reference's bellman core (``bellman/src/lib.rs``):
``Circuit`` (lib.rs:29), ``ConstraintSystem`` (lib.rs:224) with ``alloc`` /
``alloc_input`` / ``enforce`` and hierarchical namespaces,
``LinearCombination`` (lib.rs:66), ``Variable``/``Index`` (lib.rs:39-61)
and ``SynthesisError`` (lib.rs:171).

Field values are plain python ints reduced mod the engine's scalar modulus;
the heavy numeric work (NTT/MSM) happens in the device layers — synthesis
is host-side bookkeeping, exactly as in the reference where synthesis runs
on the CPU before the GPU MSMs.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional


class SynthesisError(Exception):
    """bellman SynthesisError (lib.rs:171-209)."""


class AssignmentMissing(SynthesisError):
    pass


class Unsatisfiable(SynthesisError):
    pass


@dataclasses.dataclass(frozen=True)
class Variable:
    """Index into the input or aux assignment (lib.rs:39-61).

    ``kind`` is "input" (public, statement) or "aux" (private, witness).
    Input 0 is the constant ONE wire (lib.rs ConstraintSystem::one).
    """

    kind: str
    index: int

    def __post_init__(self):
        assert self.kind in ("input", "aux")


ONE = Variable("input", 0)


class LinearCombination:
    """Sparse sum of coeff * variable (lib.rs:66-169).

    Immutable-ish: arithmetic returns new objects.  Coefficients are plain
    ints (canonical, reduced lazily by consumers).
    """

    __slots__ = ("terms",)

    def __init__(self, terms=()):
        self.terms = list(terms)

    @staticmethod
    def zero() -> "LinearCombination":
        return LinearCombination()

    @staticmethod
    def from_var(v: Variable, coeff: int = 1) -> "LinearCombination":
        return LinearCombination([(v, coeff)])

    def __add__(self, other):
        if isinstance(other, Variable):
            other = LinearCombination.from_var(other)
        if isinstance(other, tuple):  # (coeff, var) like bellman's Add impl
            coeff, var = other
            other = LinearCombination.from_var(var, coeff)
        return LinearCombination(self.terms + other.terms)

    def __sub__(self, other):
        if isinstance(other, Variable):
            other = LinearCombination.from_var(other)
        if isinstance(other, tuple):
            coeff, var = other
            other = LinearCombination.from_var(var, coeff)
        return LinearCombination(
            self.terms + [(v, -c) for (v, c) in other.terms]
        )

    def scale(self, k: int) -> "LinearCombination":
        return LinearCombination([(v, c * k) for (v, c) in self.terms])

    def eval(self, input_assignment, aux_assignment, modulus: int) -> int:
        acc = 0
        for v, c in self.terms:
            val = (
                input_assignment[v.index]
                if v.kind == "input"
                else aux_assignment[v.index]
            )
            acc += c * val
        return acc % modulus


def lc(*terms) -> LinearCombination:
    """Convenience: lc((coeff, var), var2, ...)."""
    out = LinearCombination()
    for t in terms:
        out = out + t
    return out


class ConstraintSystem:
    """Abstract constraint system (lib.rs:224-292).

    Concrete backends: KeypairAssembly (generator), ProvingAssignment
    (prover), TestConstraintSystem (circuit regression tests).
    """

    ONE = ONE

    def __init__(self):
        self._path = []

    # -- to implement -------------------------------------------------------

    def alloc(self, name: str, f: Callable[[], int]) -> Variable:
        raise NotImplementedError

    def alloc_input(self, name: str, f: Callable[[], int]) -> Variable:
        raise NotImplementedError

    def enforce(self, name: str, a: LinearCombination, b: LinearCombination,
                c: LinearCombination):
        raise NotImplementedError

    # -- namespaces (lib.rs:294-426) ----------------------------------------

    def push_namespace(self, name: str):
        self._path.append(name)

    def pop_namespace(self):
        self._path.pop()

    def namespace(self, name: str):
        cs = self

        class _NS:
            def __enter__(self):
                cs.push_namespace(name)
                return cs

            def __exit__(self, *exc):
                cs.pop_namespace()
                return False

        return _NS()

    def path_name(self, name: str) -> str:
        return "/".join(self._path + [name])


class Circuit:
    """Circuit protocol (lib.rs:29-36)."""

    def synthesize(self, cs: ConstraintSystem):
        raise NotImplementedError
