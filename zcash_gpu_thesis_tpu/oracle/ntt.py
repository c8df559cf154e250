"""Python-int NTT oracle: naive O(n^2) DFT over Fr.

Ground truth for the TPU NTT kernels — the role the bellman CPU FFT plays
for the reference's tests (`domain.rs:378-494`).
"""

from __future__ import annotations

from ..constants import FR_GENERATOR, FR_ROOT_OF_UNITY, FR_TWO_ADICITY, R, modinv


def domain_omega(n: int) -> int:
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    return pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - log_n), R)


def naive_dft(coeffs, omega: int):
    """[sum_j a_j omega^(ij)]_i — plain quadratic evaluation."""
    n = len(coeffs)
    out = []
    for i in range(n):
        acc = 0
        w = pow(omega, i, R)
        x = 1
        for a in coeffs:
            acc = (acc + a * x) % R
            x = x * w % R
        out.append(acc)
    return out


def naive_idft(evals, omega: int):
    n = len(evals)
    n_inv = modinv(n, R)
    out = naive_dft(evals, modinv(omega, R))
    return [x * n_inv % R for x in out]


def poly_mul(a, b):
    """Schoolbook polynomial product over Fr (python ints)."""
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            out[i + j] = (out[i + j] + x * y) % R
    return out


def coset_eval(coeffs, n: int):
    """Evaluate on the coset g*H (g = Fr multiplicative generator)."""
    omega = domain_omega(n)
    g = FR_GENERATOR
    shifted = [a * pow(g, i, R) % R for i, a in enumerate(coeffs)]
    return naive_dft(shifted, omega)
