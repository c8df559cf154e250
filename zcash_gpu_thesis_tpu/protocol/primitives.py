"""Sapling note / key primitives.

Re-design of ``sapling-crypto/src/primitives/mod.rs``: value commitments,
proof-generation / viewing keys, diversified payment addresses, notes,
note commitments and nullifiers.  Host-side python ints; these feed both
the FFI layer and the circuit witnesses.
"""

from __future__ import annotations

import hashlib

from . import jubjub as J


class ValueCommitment:
    """cv = [value] V + [rcv] R (primitives/mod.rs:38-50)."""

    def __init__(self, value: int, randomness: int):
        self.value = value
        self.randomness = randomness % J.FS

    def cm(self):
        params = J.JubjubParams()
        return J.edwards_add(
            J.edwards_mul(params.generator(J.VALUE_COMMITMENT_VALUE), self.value),
            J.edwards_mul(
                params.generator(J.VALUE_COMMITMENT_RANDOMNESS), self.randomness
            ),
        )


class ProofGenerationKey:
    def __init__(self, ak, nsk: int):
        self.ak = ak
        self.nsk = nsk % J.FS

    def into_viewing_key(self) -> "ViewingKey":
        params = J.JubjubParams()
        return ViewingKey(
            ak=self.ak,
            nk=J.edwards_mul(params.generator(J.PROOF_GENERATION_KEY), self.nsk),
        )


class ViewingKey:
    def __init__(self, ak, nk):
        self.ak = ak
        self.nk = nk

    def rk(self, ar: int):
        params = J.JubjubParams()
        return J.edwards_add(
            self.ak,
            J.edwards_mul(params.generator(J.SPENDING_KEY_GENERATOR), ar % J.FS),
        )

    def ivk(self) -> int:
        """CRH^ivk = BLAKE2s(ak || nk) with the top 5 bits dropped
        (primitives/mod.rs:87-104)."""
        h = hashlib.blake2s(person=J.CRH_IVK_PERSONALIZATION)
        h.update(J.point_write(self.ak))
        h.update(J.point_write(self.nk))
        d = bytearray(h.digest())
        d[31] &= 0b0000_0111
        return int.from_bytes(bytes(d), "little")

    def into_payment_address(self, diversifier: bytes):
        g_d = diversifier_g_d(diversifier)
        if g_d is None:
            return None
        pk_d = J.edwards_mul(g_d, self.ivk())
        return PaymentAddress(pk_d=pk_d, diversifier=diversifier)


def diversifier_g_d(diversifier: bytes):
    """g_d = GH(d) (primitives/mod.rs:125-133); None if invalid."""
    assert len(diversifier) == 11
    return J.group_hash(diversifier, J.KEY_DIVERSIFICATION_PERSONALIZATION)


class PaymentAddress:
    def __init__(self, pk_d, diversifier: bytes):
        self.pk_d = pk_d
        self.diversifier = diversifier

    def g_d(self):
        return diversifier_g_d(self.diversifier)

    def create_note(self, value: int, randomness: int):
        g_d = self.g_d()
        if g_d is None:
            return None
        return Note(value=value, r=randomness, g_d=g_d, pk_d=self.pk_d)


class Note:
    def __init__(self, value: int, g_d, pk_d, r: int):
        self.value = value
        self.g_d = g_d
        self.pk_d = pk_d
        self.r = r % J.FS

    @staticmethod
    def uncommitted() -> int:
        """The smallest non-curve u-coordinate (primitives/mod.rs:185)."""
        return 1

    def cm_full_point(self):
        """Pedersen commitment to (value || g_d || pk_d), randomized
        (primitives/mod.rs:195-225)."""
        contents = (
            self.value.to_bytes(8, "little")
            + J.point_write(self.g_d)
            + J.point_write(self.pk_d)
        )
        bits = [
            bool((byte >> i) & 1) for byte in contents for i in range(8)
        ]
        hashed = J.pedersen_hash(J.note_commitment_personalization(), bits)
        params = J.JubjubParams()
        return J.edwards_add(
            J.edwards_mul(
                params.generator(J.NOTE_COMMITMENT_RANDOMNESS), self.r
            ),
            hashed,
        )

    def cm(self) -> int:
        """x-coordinate of the full commitment point."""
        return self.cm_full_point()[0]

    def nf(self, viewing_key: ViewingKey, position: int) -> bytes:
        """nf = BLAKE2s(nk || rho), rho = cm + [position] J
        (primitives/mod.rs:229-250)."""
        params = J.JubjubParams()
        rho = J.edwards_add(
            self.cm_full_point(),
            J.edwards_mul(params.generator(J.NULLIFIER_POSITION), position),
        )
        h = hashlib.blake2s(person=J.PRF_NF_PERSONALIZATION)
        h.update(J.point_write(viewing_key.nk))
        h.update(J.point_write(rho))
        return h.digest()
