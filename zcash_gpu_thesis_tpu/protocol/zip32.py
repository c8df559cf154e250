"""ZIP 32: Sapling hierarchical deterministic key derivation.

Re-design of ``zip32/src/lib.rs``: PRF^expand, expanded spending keys,
full viewing keys, extended keys with hardened/non-hardened child
derivation, diversifier derivation via FF1-AES256 format-preserving
encryption (NIST SP 800-38G, radix 2 over 88 bits), and the 169-byte
xsk/xfvk serializations.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

from . import jubjub as J
from . import primitives as P

PRF_EXPAND_PERSONALIZATION = b"Zcash_ExpandSeed"
ZIP32_SAPLING_MASTER_PERSONALIZATION = b"ZcashIP32Sapling"
ZIP32_SAPLING_FVFP_PERSONALIZATION = b"ZcashSaplingFVFP"


def prf_expand(sk: bytes, *ts: bytes) -> bytes:
    h = hashlib.blake2b(digest_size=64, person=PRF_EXPAND_PERSONALIZATION)
    h.update(sk)
    for t in ts:
        h.update(t)
    return h.digest()


def _to_uniform_fs(b64: bytes) -> int:
    return int.from_bytes(b64, "little") % J.FS


def _fs_bytes(x: int) -> bytes:
    return (x % J.FS).to_bytes(32, "little")


# -- FF1-AES256, radix 2 (the fpe crate's configuration) ---------------------


class FF1Radix2:
    """NIST SP 800-38G FF1 with radix 2 and an empty tweak.

    Numeral strings map to bytes little-endian-bit-first (the fpe crate's
    BinaryNumeralString::from_bytes_le convention).
    """

    def __init__(self, key: bytes):
        assert len(key) == 32
        self._cipher = Cipher(algorithms.AES(key), modes.ECB())

    def _aes(self, block: bytes) -> bytes:
        enc = self._cipher.encryptor()
        return enc.update(block) + enc.finalize()

    def _prf(self, data: bytes) -> bytes:
        assert len(data) % 16 == 0
        r = bytes(16)
        for i in range(0, len(data), 16):
            r = self._aes(bytes(a ^ b for a, b in zip(r, data[i : i + 16])))
        return r

    @staticmethod
    def _num(numerals) -> int:
        acc = 0
        for x in numerals:
            acc = (acc << 1) | x
        return acc

    @staticmethod
    def _str(value: int, m: int):
        return [(value >> (m - 1 - i)) & 1 for i in range(m)]

    def encrypt_bits(self, x):
        n = len(x)
        u = n // 2
        v = n - u
        a, b_ = list(x[:u]), list(x[u:])
        b_len = (v + 7) // 8
        d = 4 * ((b_len + 3) // 4) + 4
        t = 0  # empty tweak
        p = bytes([1, 2, 1]) + (2).to_bytes(3, "big") + bytes([10, u % 256])
        p += n.to_bytes(4, "big") + t.to_bytes(4, "big")
        for i in range(10):
            q = bytes((-t - b_len - 1) % 16)
            q += bytes([i])
            q += self._num(b_).to_bytes(b_len, "big")
            r = self._prf(p + q)
            s = bytearray(r)
            j = 1
            while len(s) < d:
                blk = bytes(
                    x ^ y for x, y in zip(r, j.to_bytes(16, "big"))
                )
                s.extend(self._aes(blk))
                j += 1
            y = int.from_bytes(bytes(s[:d]), "big")
            m = u if i % 2 == 0 else v
            c = (self._num(a) + y) % (1 << m)
            a, b_ = b_, self._str(c, m)
        return a + b_

    def encrypt_bytes_le(self, data: bytes) -> bytes:
        # bytes -> numerals: per byte, LSB-first; numeral 0 is the most
        # significant digit of NUM (the fpe crate convention)
        bits = [(byte >> k) & 1 for byte in data for k in range(8)]
        out = self.encrypt_bits(bits)
        res = bytearray(len(data))
        for i, bit in enumerate(out):
            res[i // 8] |= bit << (i % 8)
        return bytes(res)


# -- key structures ----------------------------------------------------------


class ExpandedSpendingKey:
    def __init__(self, ask: int, nsk: int, ovk: bytes):
        self.ask, self.nsk, self.ovk = ask % J.FS, nsk % J.FS, ovk

    @staticmethod
    def from_spending_key(sk: bytes) -> "ExpandedSpendingKey":
        return ExpandedSpendingKey(
            ask=_to_uniform_fs(prf_expand(sk, b"\x00")),
            nsk=_to_uniform_fs(prf_expand(sk, b"\x01")),
            ovk=prf_expand(sk, b"\x02")[:32],
        )

    def derive_child(self, i_l: bytes) -> "ExpandedSpendingKey":
        return ExpandedSpendingKey(
            ask=(_to_uniform_fs(prf_expand(i_l, b"\x13")) + self.ask) % J.FS,
            nsk=(_to_uniform_fs(prf_expand(i_l, b"\x14")) + self.nsk) % J.FS,
            ovk=prf_expand(i_l, b"\x15", self.ovk)[:32],
        )

    def to_bytes(self) -> bytes:
        return _fs_bytes(self.ask) + _fs_bytes(self.nsk) + self.ovk

    @staticmethod
    def from_bytes(b: bytes) -> "ExpandedSpendingKey":
        return ExpandedSpendingKey(
            int.from_bytes(b[:32], "little"),
            int.from_bytes(b[32:64], "little"),
            b[64:96],
        )


class FullViewingKey:
    def __init__(self, ak, nk, ovk: bytes):
        self.vk = P.ViewingKey(ak, nk)
        self.ovk = ovk

    @staticmethod
    def from_expanded_spending_key(expsk: ExpandedSpendingKey):
        params = J.JubjubParams()
        return FullViewingKey(
            ak=J.edwards_mul(
                params.generator(J.SPENDING_KEY_GENERATOR), expsk.ask
            ),
            nk=J.edwards_mul(
                params.generator(J.PROOF_GENERATION_KEY), expsk.nsk
            ),
            ovk=expsk.ovk,
        )

    def derive_child(self, i_l: bytes) -> "FullViewingKey":
        params = J.JubjubParams()
        i_ask = _to_uniform_fs(prf_expand(i_l, b"\x13"))
        i_nsk = _to_uniform_fs(prf_expand(i_l, b"\x14"))
        return FullViewingKey(
            ak=J.edwards_add(
                J.edwards_mul(
                    params.generator(J.SPENDING_KEY_GENERATOR), i_ask
                ),
                self.vk.ak,
            ),
            nk=J.edwards_add(
                J.edwards_mul(
                    params.generator(J.PROOF_GENERATION_KEY), i_nsk
                ),
                self.vk.nk,
            ),
            ovk=prf_expand(i_l, b"\x15", self.ovk)[:32],
        )

    def to_bytes(self) -> bytes:
        return (
            J.point_write(self.vk.ak) + J.point_write(self.vk.nk) + self.ovk
        )

    def fingerprint(self) -> bytes:
        h = hashlib.blake2b(
            digest_size=32, person=ZIP32_SAPLING_FVFP_PERSONALIZATION
        )
        h.update(self.to_bytes())
        return h.digest()

    def tag(self) -> bytes:
        return self.fingerprint()[:4]


class DiversifierKey:
    def __init__(self, dk: bytes):
        self.dk = dk

    @staticmethod
    def master(sk_m: bytes) -> "DiversifierKey":
        return DiversifierKey(prf_expand(sk_m, b"\x10")[:32])

    def derive_child(self, i_l: bytes) -> "DiversifierKey":
        return DiversifierKey(prf_expand(i_l, b"\x16", self.dk)[:32])

    def diversifier(self, j: int) -> Optional[Tuple[int, bytes]]:
        """First valid diversifier at index >= j (zip32 lib.rs:313-335)."""
        ff = FF1Radix2(self.dk)
        while j < 1 << 88:
            d_j = ff.encrypt_bytes_le(j.to_bytes(11, "little"))
            if P.diversifier_g_d(d_j) is not None:
                return (j, d_j)
            j += 1
        return None


HARDENED = 1 << 31


class ExtendedSpendingKey:
    def __init__(self, depth, parent_fvk_tag, child_index, chain_code,
                 expsk: ExpandedSpendingKey, dk: DiversifierKey):
        self.depth = depth
        self.parent_fvk_tag = parent_fvk_tag
        self.child_index = child_index
        self.chain_code = chain_code
        self.expsk = expsk
        self.dk = dk

    @staticmethod
    def master(seed: bytes) -> "ExtendedSpendingKey":
        h = hashlib.blake2b(
            digest_size=64, person=ZIP32_SAPLING_MASTER_PERSONALIZATION
        )
        h.update(seed)
        i = h.digest()
        sk_m, c_m = i[:32], i[32:]
        return ExtendedSpendingKey(
            depth=0, parent_fvk_tag=bytes(4), child_index=0,
            chain_code=c_m,
            expsk=ExpandedSpendingKey.from_spending_key(sk_m),
            dk=DiversifierKey.master(sk_m),
        )

    def derive_child(self, i: int) -> "ExtendedSpendingKey":
        fvk = FullViewingKey.from_expanded_spending_key(self.expsk)
        le_i = (i & 0xFFFFFFFF).to_bytes(4, "little")
        if i >= HARDENED:
            tmp = prf_expand(
                self.chain_code, b"\x11", self.expsk.to_bytes(),
                self.dk.dk, le_i,
            )
        else:
            tmp = prf_expand(
                self.chain_code, b"\x12", fvk.to_bytes(), self.dk.dk, le_i
            )
        i_l, c_i = tmp[:32], tmp[32:]
        return ExtendedSpendingKey(
            depth=self.depth + 1,
            parent_fvk_tag=fvk.tag(),
            child_index=i,
            chain_code=c_i,
            expsk=self.expsk.derive_child(i_l),
            dk=self.dk.derive_child(i_l),
        )

    @staticmethod
    def from_path(master: "ExtendedSpendingKey", path) -> "ExtendedSpendingKey":
        xsk = master
        for i in path:
            xsk = xsk.derive_child(i)
        return xsk

    def to_bytes(self) -> bytes:
        return (
            bytes([self.depth]) + self.parent_fvk_tag
            + self.child_index.to_bytes(4, "little") + self.chain_code
            + self.expsk.to_bytes() + self.dk.dk
        )

    @staticmethod
    def from_bytes(b: bytes) -> "ExtendedSpendingKey":
        assert len(b) == 169
        return ExtendedSpendingKey(
            depth=b[0], parent_fvk_tag=b[1:5],
            child_index=int.from_bytes(b[5:9], "little"),
            chain_code=b[9:41],
            expsk=ExpandedSpendingKey.from_bytes(b[41:137]),
            dk=DiversifierKey(b[137:169]),
        )

    def default_address(self):
        return ExtendedFullViewingKey.from_xsk(self).default_address()


class ExtendedFullViewingKey:
    def __init__(self, depth, parent_fvk_tag, child_index, chain_code,
                 fvk: FullViewingKey, dk: DiversifierKey):
        self.depth = depth
        self.parent_fvk_tag = parent_fvk_tag
        self.child_index = child_index
        self.chain_code = chain_code
        self.fvk = fvk
        self.dk = dk

    @staticmethod
    def from_xsk(xsk: ExtendedSpendingKey) -> "ExtendedFullViewingKey":
        return ExtendedFullViewingKey(
            depth=xsk.depth, parent_fvk_tag=xsk.parent_fvk_tag,
            child_index=xsk.child_index, chain_code=xsk.chain_code,
            fvk=FullViewingKey.from_expanded_spending_key(xsk.expsk),
            dk=xsk.dk,
        )

    def derive_child(self, i: int) -> Optional["ExtendedFullViewingKey"]:
        if i >= HARDENED:
            return None
        le_i = i.to_bytes(4, "little")
        tmp = prf_expand(
            self.chain_code, b"\x12", self.fvk.to_bytes(), self.dk.dk, le_i
        )
        i_l, c_i = tmp[:32], tmp[32:]
        return ExtendedFullViewingKey(
            depth=self.depth + 1,
            parent_fvk_tag=self.fvk.tag(),
            child_index=i,
            chain_code=c_i,
            fvk=self.fvk.derive_child(i_l),
            dk=self.dk.derive_child(i_l),
        )

    def to_bytes(self) -> bytes:
        return (
            bytes([self.depth]) + self.parent_fvk_tag
            + self.child_index.to_bytes(4, "little") + self.chain_code
            + self.fvk.to_bytes() + self.dk.dk
        )

    def address(self, j: int):
        res = self.dk.diversifier(j)
        if res is None:
            return None
        j, d_j = res
        addr = self.fvk.vk.into_payment_address(d_j)
        if addr is None:
            return None
        return (j, addr)

    def default_address(self):
        return self.address(0)
