"""ctypes bindings for the native C++ runtime library (native/).

Provides BLAKE2b (HashReader / equihash base state), the equihash
verifier, and bulk byte<->12-bit-limb repacking.  Falls back to the
pure-python implementations transparently when the shared library has
not been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native", "libzktpu_native.so",
)

_lib = None


def lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        l = ctypes.CDLL(_LIB_PATH)
        l.zktpu_blake2b.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
        ]
        l.zktpu_eh_is_valid.restype = ctypes.c_int
        l.zktpu_eh_is_valid.argtypes = [
            ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t,
        ]
        l.zktpu_bytes_to_limbs.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_size_t,
        ]
        l.zktpu_limbs_to_bytes.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t,
        ]
        _lib = l
    return _lib


def available() -> bool:
    return lib() is not None


def blake2b(data: bytes, person: bytes = b"", digest_size: int = 64) -> bytes:
    l = lib()
    if l is None:
        import hashlib

        return hashlib.blake2b(
            data, digest_size=digest_size, person=person
        ).digest()
    out = ctypes.create_string_buffer(digest_size)
    l.zktpu_blake2b(data, len(data), person, len(person), out, digest_size)
    return out.raw


def eh_is_valid(n: int, k: int, input_: bytes, nonce: bytes,
                soln: bytes) -> bool:
    l = lib()
    if l is None:
        from .protocol.equihash import is_valid_solution

        return is_valid_solution(n, k, input_, nonce, soln)
    return bool(
        l.zktpu_eh_is_valid(
            n, k, input_, len(input_), nonce, len(nonce), soln, len(soln)
        )
    )


def bytes_to_limbs(rows: bytes, n_rows: int, row_bytes: int,
                   n_limbs: int) -> np.ndarray:
    """[n_rows] little-endian byte rows -> [n_rows, n_limbs] int32."""
    l = lib()
    out = np.zeros((n_rows, n_limbs), dtype=np.int32)
    if l is None:
        arr = np.frombuffer(rows, np.uint8).reshape(n_rows, row_bytes)
        for i in range(n_limbs):
            bit = 12 * i
            byte = bit // 8
            if byte >= row_bytes:
                continue
            v = arr[:, byte].astype(np.int32)
            if byte + 1 < row_bytes:
                v |= arr[:, byte + 1].astype(np.int32) << 8
            if byte + 2 < row_bytes:
                v |= arr[:, byte + 2].astype(np.int32) << 16
            out[:, i] = (v >> (bit % 8)) & 0xFFF
        return out
    l.zktpu_bytes_to_limbs(
        rows, n_rows, row_bytes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_limbs,
    )
    return out


def limbs_to_bytes(limbs: np.ndarray, row_bytes: int) -> bytes:
    limbs = np.ascontiguousarray(limbs, dtype=np.int32)
    n_rows, n_limbs = limbs.shape
    l = lib()
    if l is None:
        out = bytearray(n_rows * row_bytes)
        for r in range(n_rows):
            v = 0
            for i in range(n_limbs - 1, -1, -1):
                v = (v << 12) | int(limbs[r, i])
            out[r * row_bytes : (r + 1) * row_bytes] = v.to_bytes(
                row_bytes, "little"
            )
        return bytes(out)
    out = ctypes.create_string_buffer(n_rows * row_bytes)
    l.zktpu_limbs_to_bytes(
        limbs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_rows, n_limbs, out, row_bytes,
    )
    return out.raw
