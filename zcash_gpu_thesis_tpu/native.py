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
        u64p = ctypes.POINTER(ctypes.c_uint64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i8p = ctypes.POINTER(ctypes.c_int8)
        for g in ("g1", "g2"):
            stage = getattr(l, f"zktpu_msm_stage_{g}")
            stage.restype = ctypes.c_void_p
            stage.argtypes = [u64p, u64p, u8p, ctypes.c_size_t]
            getattr(l, f"zktpu_msm_free_{g}").argtypes = [ctypes.c_void_p]
            ws = getattr(l, f"zktpu_msm_{g}_window_sums")
            ws.argtypes = [
                ctypes.c_void_p, i8p, ctypes.c_size_t, ctypes.c_size_t,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                u64p,
            ]
            getattr(l, f"zktpu_{g}_mul").argtypes = [u64p, u64p, u64p, u64p]
        if hasattr(l, "zktpu_tape_run"):
            i32p = ctypes.POINTER(ctypes.c_int32)
            i16p = ctypes.POINTER(ctypes.c_int16)
            l.zktpu_tape_run.restype = ctypes.c_int
            l.zktpu_tape_run.argtypes = [
                u8p, i32p, i32p, i32p, i16p, ctypes.c_size_t,
                u64p, ctypes.c_size_t, u64p, ctypes.c_size_t,
                i32p, ctypes.c_size_t, i16p,
            ]
            l.zktpu_tape_run_split.restype = ctypes.c_int
            l.zktpu_tape_run_split.argtypes = [
                u8p, i32p, i32p, i32p, i16p, ctypes.c_size_t,
                u64p, ctypes.c_size_t, u64p, ctypes.c_size_t,
                i32p, ctypes.c_size_t, i16p,
                i32p, ctypes.c_size_t, u8p,
                i32p, ctypes.c_size_t, i16p,
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


def _u64_rows(vals, width: int) -> np.ndarray:
    """python ints -> [n, width] u64 little-endian limb rows."""
    out = np.zeros((len(vals), width), dtype=np.uint64)
    for i, v in enumerate(vals):
        v = int(v)
        for k in range(width):
            out[i, k] = (v >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
    return out


def _row_int(row) -> int:
    v = 0
    for k in range(len(row) - 1, -1, -1):
        v = (v << 64) | int(row[k])
    return v


class MsmStage:
    """Staged affine points for the native host Pippenger (the reference's
    CPU multiexp path, bellman/src/multiexp.rs:140-232, as a native
    component; also the host half of the Chapter7 hybrid window split).

    ``points``: python-int affine points ((x, y) ints for G1, pairs of
    int-tuples for G2; None = infinity)."""

    def __init__(self, points, g2: bool = False):
        import ctypes as ct

        l = lib()
        assert l is not None, "native library not built (make -C native)"
        self.g2 = g2
        self.n = len(points)
        w = 12 if g2 else 6
        inf = np.fromiter((p is None for p in points), np.uint8,
                          count=self.n)
        # bulk byte repack (one to_bytes per coordinate, one frombuffer
        # per array) — the per-point _u64_rows loop cost ~20 min staging
        # the Sprout CRS's ~6M points
        zero48 = bytes(48)

        def pack(sel):
            buf = b"".join(
                zero48 if p is None else int(sel(p)).to_bytes(48, "little")
                for p in points)
            return np.frombuffer(buf, np.uint64).reshape(self.n, 6)

        if g2:
            xs = np.concatenate(
                [pack(lambda p: p[0][0]), pack(lambda p: p[0][1])],
                axis=1)
            ys = np.concatenate(
                [pack(lambda p: p[1][0]), pack(lambda p: p[1][1])],
                axis=1)
        else:
            xs = pack(lambda p: p[0])
            ys = pack(lambda p: p[1])
        xs = np.ascontiguousarray(xs)
        ys = np.ascontiguousarray(ys)
        g = "g2" if g2 else "g1"
        self._free = getattr(l, f"zktpu_msm_free_{g}")
        self._ws = getattr(l, f"zktpu_msm_{g}_window_sums")
        self._h = getattr(l, f"zktpu_msm_stage_{g}")(
            xs.ctypes.data_as(ct.POINTER(ct.c_uint64)),
            ys.ctypes.data_as(ct.POINTER(ct.c_uint64)),
            inf.ctypes.data_as(ct.POINTER(ct.c_uint8)), self.n)

    def window_sums(self, digits: np.ndarray, lo_w: int, hi_w: int, c: int,
                    n_threads: int = 0):
        """Signed digit matrix [n, W] (int8) -> list of python-int affine
        window sums for windows lo_w..hi_w-1 (None = infinity)."""
        import ctypes as ct
        import os as _os

        from .constants import Q, modinv

        if n_threads <= 0:
            n_threads = _os.cpu_count() or 1
        digits = np.ascontiguousarray(digits, dtype=np.int8)
        n, w_count = digits.shape
        assert n == self.n
        coords = 6 if self.g2 else 3
        out = np.zeros((w_count, coords * 6), dtype=np.uint64)
        self._ws(self._h,
                 digits.ctypes.data_as(ct.POINTER(ct.c_int8)),
                 n, w_count, lo_w, hi_w, c, n_threads,
                 out.ctypes.data_as(ct.POINTER(ct.c_uint64)))
        sums = []
        for w in range(lo_w, hi_w):
            row = out[w]
            if self.g2:
                x = (_row_int(row[0:6]), _row_int(row[6:12]))
                y = (_row_int(row[12:18]), _row_int(row[18:24]))
                z = (_row_int(row[24:30]), _row_int(row[30:36]))
                if z == (0, 0):
                    sums.append(None)
                    continue
                from .oracle import curve as O

                zi = O.f2_inv(z)
                zi2 = O.f2_mul(zi, zi)
                zi3 = O.f2_mul(zi2, zi)
                sums.append((O.f2_mul(x, zi2), O.f2_mul(y, zi3)))
            else:
                x, y = _row_int(row[0:6]), _row_int(row[6:12])
                z = _row_int(row[12:18])
                if z == 0:
                    sums.append(None)
                    continue
                zi = modinv(z, Q)
                zi2 = zi * zi % Q
                sums.append((x * zi2 % Q, y * zi2 % Q * zi % Q))
        return sums

    def __del__(self):
        if getattr(self, "_h", None):
            self._free(self._h)
            self._h = None


def _mul_call(fn, xs, ys, k, coords):
    import ctypes as ct

    karr = _u64_rows([k], 4)[0]
    out = np.zeros(coords * 6, dtype=np.uint64)
    p = ct.POINTER(ct.c_uint64)
    fn(xs.ctypes.data_as(p), ys.ctypes.data_as(p),
       karr.ctypes.data_as(p), out.ctypes.data_as(p))
    return out


def g1_mul(point, k: int):
    """Native single G1 scalar mul (canonical ints in/out; None =
    infinity).  The prover's blinding algebra uses this — a python-int
    wNAF walk costs ~40 ms per mul vs ~0.3 ms here."""
    l = lib()
    assert l is not None, "native library not built (make -C native)"
    if point is None or k == 0:
        return None
    from .constants import Q, modinv

    xs = _u64_rows([point[0]], 6)[0]
    ys = _u64_rows([point[1]], 6)[0]
    out = _mul_call(l.zktpu_g1_mul, xs, ys, k, 3)
    x, y, z = _row_int(out[0:6]), _row_int(out[6:12]), _row_int(out[12:18])
    if z == 0:
        return None
    zi = modinv(z, Q)
    zi2 = zi * zi % Q
    return (x * zi2 % Q, y * zi2 % Q * zi % Q)


def g2_mul(point, k: int):
    """Native single G2 scalar mul (pairs of canonical ints)."""
    l = lib()
    assert l is not None, "native library not built (make -C native)"
    if point is None or k == 0:
        return None
    from .oracle import curve as O

    xs = np.concatenate([_u64_rows([point[0][0]], 6)[0],
                         _u64_rows([point[0][1]], 6)[0]])
    ys = np.concatenate([_u64_rows([point[1][0]], 6)[0],
                         _u64_rows([point[1][1]], 6)[0]])
    out = _mul_call(l.zktpu_g2_mul, xs, ys, k, 6)
    x = (_row_int(out[0:6]), _row_int(out[6:12]))
    y = (_row_int(out[12:18]), _row_int(out[18:24]))
    z = (_row_int(out[24:30]), _row_int(out[30:36]))
    if z == (0, 0):
        return None
    zi = O.f2_inv(z)
    zi2 = O.f2_mul(zi, zi)
    return (O.f2_mul(x, zi2), O.f2_mul(y, O.f2_mul(zi2, zi)))


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
