"""Groth16 proving system (re-design of ``bellman/src/groth16/``)."""

from .engine import BlsEngine, DummyEngine
from .generator import generate_parameters, generate_random_parameters
from .params import Parameters, PreparedVerifyingKey, Proof, VerifyingKey
from .prover import create_proof, create_random_proof
from .r1cs import (Circuit, ConstraintSystem, LinearCombination,
                   SynthesisError, Variable, lc)
from .verifier import prepare_verifying_key, verify_proof

__all__ = [
    "BlsEngine", "DummyEngine", "generate_parameters",
    "generate_random_parameters", "Parameters", "PreparedVerifyingKey",
    "Proof", "VerifyingKey", "create_proof", "create_random_proof",
    "Circuit", "ConstraintSystem", "LinearCombination", "SynthesisError",
    "Variable", "lc", "prepare_verifying_key", "verify_proof",
]
