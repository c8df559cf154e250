"""Groth16 CRS generation.

Re-design of ``bellman/src/groth16/generator.rs``: synthesize the circuit
into a QAP skeleton (``KeypairAssembly``, generator.rs:67), evaluate the
Lagrange basis at tau via an inverse NTT (generator.rs powers-of-tau ifft),
then batch fixed-base exponentiation of the h/l/a/b base vectors (the
reference uses wNAF tables, pairing/src/wnaf.rs; the TPU engine uses a
batched double-and-add scan).
"""

from __future__ import annotations

import random
from typing import Optional

from .params import Parameters, VerifyingKey
from .r1cs import ConstraintSystem, LinearCombination, SynthesisError, Variable


class KeypairAssembly(ConstraintSystem):
    """QAP skeleton: per-variable lists of (coeff, constraint_index)
    (generator.rs:67-120)."""

    def __init__(self, modulus: int):
        super().__init__()
        self.modulus = modulus
        self.num_inputs = 0
        self.num_aux = 0
        self.num_constraints = 0
        self.at_inputs, self.bt_inputs, self.ct_inputs = [], [], []
        self.at_aux, self.bt_aux, self.ct_aux = [], [], []
        self.alloc_input("one", lambda: 1)

    def alloc(self, name, f):
        self.at_aux.append([])
        self.bt_aux.append([])
        self.ct_aux.append([])
        v = Variable("aux", self.num_aux)
        self.num_aux += 1
        return v

    def alloc_input(self, name, f):
        self.at_inputs.append([])
        self.bt_inputs.append([])
        self.ct_inputs.append([])
        v = Variable("input", self.num_inputs)
        self.num_inputs += 1
        return v

    def _absorb(self, lc: LinearCombination, inputs_list, aux_list):
        for var, coeff in lc.terms:
            coeff %= self.modulus
            if coeff == 0:
                continue
            tgt = inputs_list if var.kind == "input" else aux_list
            tgt[var.index].append((coeff, self.num_constraints))

    def enforce(self, name, a, b, c):
        self._absorb(a, self.at_inputs, self.at_aux)
        self._absorb(b, self.bt_inputs, self.bt_aux)
        self._absorb(c, self.ct_inputs, self.ct_aux)
        self.num_constraints += 1


def generate_parameters(engine, circuit, alpha, beta, gamma, delta, tau):
    """generate_parameters (generator.rs:39): explicit toxic waste."""
    p = engine.r
    assembly = KeypairAssembly(p)
    circuit.synthesize(assembly)

    # Input consistency constraints: (x_i) * 0 = 0 per input
    # (generator.rs — prevents input malleability).
    for i in range(assembly.num_inputs):
        assembly.enforce(
            f"input {i}",
            LinearCombination.from_var(Variable("input", i)),
            LinearCombination.zero(),
            LinearCombination.zero(),
        )

    m = 1
    while m < assembly.num_constraints:
        m *= 2
    domain = engine.domain(m)

    # Lagrange values at tau: ifft of (tau^0 .. tau^(m-1))
    # = [L_j(tau)]_j  (generator.rs powers_of_tau.ifft()).
    powers_of_tau = []
    t = 1
    for _ in range(m):
        powers_of_tau.append(t)
        t = t * tau % p
    u = domain.ifft(powers_of_tau)

    gamma_inv = pow(gamma, p - 2, p)
    delta_inv = pow(delta, p - 2, p)

    # z(tau) = tau^m - 1; h bases: tau^i z(tau) / delta.
    z_tau = (pow(tau, m, p) - 1) % p
    h_scalars = []
    t = z_tau * delta_inv % p
    for _ in range(m - 1):
        h_scalars.append(t)
        t = t * tau % p

    def eval_qap(entries):
        acc = 0
        for coeff, j in entries:
            acc += coeff * u[j]
        return acc % p

    n_in, n_aux = assembly.num_inputs, assembly.num_aux
    at = [eval_qap(e) for e in assembly.at_inputs + assembly.at_aux]
    bt = [eval_qap(e) for e in assembly.bt_inputs + assembly.bt_aux]
    ct = [eval_qap(e) for e in assembly.ct_inputs + assembly.ct_aux]

    # ic (inputs, /gamma) and l (aux, /delta): (beta u + alpha v + w)
    ic_scalars = [
        (beta * at[i] + alpha * bt[i] + ct[i]) * gamma_inv % p
        for i in range(n_in)
    ]
    l_scalars = [
        (beta * at[n_in + i] + alpha * bt[n_in + i] + ct[n_in + i])
        * delta_inv % p
        for i in range(n_aux)
    ]

    # Batched fixed-base exponentiations (device for the BLS engine).
    h = engine.fixed_base_g1(h_scalars)
    ic = engine.fixed_base_g1(ic_scalars)
    l = engine.fixed_base_g1(l_scalars)
    a = engine.fixed_base_g1(at)
    b_g1 = engine.fixed_base_g1(bt)
    b_g2 = engine.fixed_base_g2(bt)

    vk = VerifyingKey(
        alpha_g1=engine.g1_mul(engine.g1_gen, alpha),
        beta_g1=engine.g1_mul(engine.g1_gen, beta),
        beta_g2=engine.g2_mul(engine.g2_gen, beta),
        gamma_g2=engine.g2_mul(engine.g2_gen, gamma),
        delta_g1=engine.g1_mul(engine.g1_gen, delta),
        delta_g2=engine.g2_mul(engine.g2_gen, delta),
        ic=ic,
    )
    return Parameters(
        vk=vk, h=h, l=l, a=a, b_g1=b_g1, b_g2=b_g2,
        num_inputs=n_in, num_aux=n_aux,
    )


def generate_random_parameters(engine, circuit, rng: Optional[random.Random] = None):
    """generate_random_parameters (generator.rs:16-36)."""
    rng = rng or random.Random()
    p = engine.r
    return generate_parameters(
        engine, circuit,
        alpha=rng.randrange(1, p), beta=rng.randrange(1, p),
        gamma=rng.randrange(1, p), delta=rng.randrange(1, p),
        tau=rng.randrange(1, p),
    )
