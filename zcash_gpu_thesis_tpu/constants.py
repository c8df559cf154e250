"""BLS12-381 curve constants (public parameters of the Zcash curve).

These are the same public constants the reference implements in
`librustzcash/pairing/src/bls12_381/{fq.rs,fr.rs,ec.rs}` — field moduli,
Montgomery parameters, curve coefficients and generator coordinates.  All
derived quantities (Montgomery R, R^2, inverses, roots of unity, Frobenius
coefficients) are *computed* here from the primary constants with Python
integer arithmetic, and sanity-checked at import time, rather than
transcribed.
"""

# ---------------------------------------------------------------------------
# Primary constants (from the BLS12-381 specification).
# ---------------------------------------------------------------------------

# Base field modulus q (381 bits).  Reference: pairing/src/bls12_381/fq.rs:6.
Q = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB

# Scalar field modulus r (255 bits) = order of G1/G2.
# Reference: pairing/src/bls12_381/fr.rs:5.
R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

# BLS parameter x (the curve family parameter; negative).
# q = (x-1)^2 * (x^4 - x^2 + 1) / 3 + x,  r = x^4 - x^2 + 1.
BLS_X = -0xD201000000010000

# Curve equation: y^2 = x^3 + 4 over Fq; twist: y^2 = x^3 + 4(u+1) over Fq2.
B_COEFF = 4

# Multiplicative generator of Fr (fr.rs: GENERATOR = 7) and of Fq (= 2).
FR_GENERATOR = 7
FQ_GENERATOR = 2

# 2-adicity of r-1 (fr.rs: S = 32): r - 1 = 2^32 * odd.
FR_TWO_ADICITY = 32

# G1 generator affine coordinates (ec.rs G1Affine::one).
G1_GEN_X = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
G1_GEN_Y = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1

# G2 generator affine coordinates over Fq2 = Fq[u]/(u^2+1), as (c0, c1).
G2_GEN_X_C0 = 0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8
G2_GEN_X_C1 = 0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E
G2_GEN_Y_C0 = 0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801
G2_GEN_Y_C1 = 0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE

# Cofactors.
G1_COFACTOR = 0x396C8C005555E1568C00AAAB0000AAAB
G2_COFACTOR = 0x5D543A95414E7F1091D50792876A202CD91DE4547085ABAA68A205B2E5A7DDFA628F1CB4D9E82EF21537E293A6691AE1616EC6E786F0C70CF1C38E31C7238E5

# ---------------------------------------------------------------------------
# Derived constants.
# ---------------------------------------------------------------------------

FQ_BITS = 381
FR_BITS = 255

# Limb layout: 12-bit limbs held in int32 lanes (TPU has no 64-bit carry
# chains; the reference's OpenCL port split u64 into u32 halves for the same
# reason, bellman/src/bls12-381.cl:6-20).  12-bit limbs are chosen so that a
# full schoolbook product row (<= 33 partial products of < 2^24 each, plus
# redundancy slack) accumulates exactly in an int32 lane with *no* per-step
# carry handling; carries are resolved by a 3-round parallel "ripple" pass.
LIMB_BITS = 12
FQ_LIMBS = 33   # 33 * 12 = 396 bits  -> Montgomery R = 2^396
FR_LIMBS = 24   # 24 * 12 = 288 bits  -> Montgomery R = 2^288
# Lazy-reduction fold boundary B = 2^(12*FOLD): values are kept < 2*B.
# Requires B >= 8*p (three bits of headroom): 2^384 ~ 9.9q, 2^264 ~ 2^9.1 r.
FQ_FOLD = 32    # B_q = 2^384
FR_FOLD = 22    # B_r = 2^264


def modinv(a: int, m: int) -> int:
    """Modular inverse of a mod m (python-int).

    CPython's native three-arg pow: the recursive egcd this replaced was
    the single largest slice of witness synthesis (the jubjub/ecc witness
    formulas invert per gadget step)."""
    try:
        return pow(a, -1, m)
    except ValueError:
        raise ValueError("not invertible") from None


# Montgomery parameters, computed (fq.rs INV/R/R2 and fr.rs equivalents are
# the 64-bit-limb versions of the same quantities; our R differs — 2^396 /
# 2^288 instead of 2^384 / 2^256 — canonical values are unaffected).
FQ_R = pow(2, FQ_LIMBS * LIMB_BITS, Q)          # 2^396 mod q
FQ_R2 = pow(2, 2 * FQ_LIMBS * LIMB_BITS, Q)
FQ_NPRIME = (-modinv(Q, 1 << (FQ_LIMBS * LIMB_BITS))) % (1 << (FQ_LIMBS * LIMB_BITS))

FR_R = pow(2, FR_LIMBS * LIMB_BITS, R)
FR_R2 = pow(2, 2 * FR_LIMBS * LIMB_BITS, R)
FR_NPRIME = (-modinv(R, 1 << (FR_LIMBS * LIMB_BITS))) % (1 << (FR_LIMBS * LIMB_BITS))

# Root of unity for the maximal power-of-two subgroup of Fr^* :
# 7^((r-1)/2^32) mod r (fr.rs ROOT_OF_UNITY in Montgomery form).
FR_ROOT_OF_UNITY = pow(FR_GENERATOR, (R - 1) >> FR_TWO_ADICITY, R)

# ---------------------------------------------------------------------------
# Import-time sanity checks (cheap; catch transcription typos).
# ---------------------------------------------------------------------------

assert (R - 1) % (1 << FR_TWO_ADICITY) == 0
assert ((R - 1) >> FR_TWO_ADICITY) % 2 == 1
assert pow(FR_ROOT_OF_UNITY, 1 << FR_TWO_ADICITY, R) == 1
assert pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - 1), R) == R - 1

# Generator satisfies the curve equation y^2 = x^3 + 4.
assert (G1_GEN_Y * G1_GEN_Y - (G1_GEN_X ** 3 + B_COEFF)) % Q == 0

# G2 generator satisfies y^2 = x^3 + 4(u+1) over Fq2 with u^2 = -1.
def _fq2_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    return ((a0 * b0 - a1 * b1) % Q, (a0 * b1 + a1 * b0) % Q)


_x2 = (G2_GEN_X_C0, G2_GEN_X_C1)
_y2 = (G2_GEN_Y_C0, G2_GEN_Y_C1)
_rhs = _fq2_mul(_fq2_mul(_x2, _x2), _x2)
_rhs = ((_rhs[0] + B_COEFF) % Q, (_rhs[1] + B_COEFF) % Q)
_lhs = _fq2_mul(_y2, _y2)
assert _lhs == _rhs, "G2 generator not on the twist"

# r is the group order: q + 1 - t must be h * r; spot-check via x-parameters.
assert R == BLS_X ** 4 - BLS_X ** 2 + 1
assert Q == ((BLS_X - 1) ** 2 * R) // 3 + BLS_X
