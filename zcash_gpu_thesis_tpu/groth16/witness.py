"""Compiled constraint-system evaluation (the synthesis fast path).

The reference synthesizes witnesses in compiled Rust: every ``enforce``
eagerly evaluates three ``LinearCombination``s against the assignment
(``bellman/src/groth16/prover.rs:84-190``) at negligible cost next to the
2.0 s proof.  A python-int interpreter doing the same walk dominates the
proof wall time at Sapling/Sprout scale (~30M term visits for Sprout's
1,989,085 constraints).

TPU-native re-design: the three constraint matrices A/B/C are *compiled
once per circuit shape* into chunked CSR-style arrays, and each proof
evaluates a = A.z, b = B.z, c = C.z as ONE sparse-matrix/vector product
over Fr on the device:

  * coefficients are deduplicated into a small table stored as
    ``coeff * R^2 mod r`` canonical limbs, so a single ``mont_mul``
    against the canonical assignment limbs yields the Montgomery-form
    product ``coeff * z * R`` — sign handling folds into ``(-c) mod r``;
  * per-row sums use NO scatter: terms are recorded row-sorted, so each
    fixed-size chunk computes an int32 cumulative sum over the limb axis
    and gathers row boundaries (a vectorized ``reduceat``), accumulating
    into the output with one ``dynamic_update_slice`` per chunk — XLA
    control flow via ``lax.scan``, one compiled executable per shape;
  * the final per-row value (< max_row_terms * r) is restored to the
    lazy-limb invariant with the field layer's parallel ripple/fold and
    leaves as exact canonical digits via ``from_mont`` (the REDC cancels
    the R the products carried) — bit-exact against the python-int
    evaluation, feeding ``h_poly_dev_canon`` directly with NO host pack.

Compiled structures are cached in-process per circuit shape key and
persisted to the params directory, so warm proofs skip both the python
CSR build and the term recording entirely.
"""

from __future__ import annotations

import os

import numpy as np

CHUNK = 1 << 18  # terms per scan step; int32 cumsum safe to 2^18 * 2^12

# max terms in one linear combination the final reduction supports
# (value < K * r < 2^270 keeps the ripple/fold ladder exact; Sapling's
# longest LCs are the ~255-term boolean packings)
MAX_ROW_TERMS = 1 << 15


class CompiledMatrix:
    """One constraint matrix in chunked row-sorted CSR form."""

    __slots__ = ("cols", "cid", "end", "r0", "span", "nnz")

    def __init__(self, cols, cid, end, r0, span, nnz):
        self.cols, self.cid, self.end, self.r0 = cols, cid, end, r0
        self.span, self.nnz = span, nnz


# Format version of the persisted structure npz.  Bump whenever the
# cols/cid/end/r0 encoding, the coeff-table form, or _eval_matrix's
# contract changes: load() rejects other versions (and any payload whose
# content digest does not match), falling back to a fresh recompile —
# counts alone cannot distinguish a stale encoding from a current one.
FORMAT_VERSION = 2


def _content_digest(arrs: dict) -> np.ndarray:
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    for name in sorted(arrs):
        a = np.ascontiguousarray(arrs[name])
        h.update(name.encode())
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return np.frombuffer(h.digest(), np.uint8).copy()


class CompiledConstraints:
    """A/B/C matrices + coefficient table for one circuit shape."""

    def __init__(self, mats, coeff_tab, n_constraints, n_inputs, n_vars):
        self.mats = mats  # dict: "a"/"b"/"c" -> CompiledMatrix
        self.coeff_tab = coeff_tab  # [n_coeff, L] int16 (c * R^2 digits)
        self.n_constraints = n_constraints
        self.n_inputs = n_inputs
        self.n_vars = n_vars
        self._dev = None  # lazily uploaded device arrays
        self._eval_jit = None

    # -- evaluation ---------------------------------------------------------

    def _device_arrays(self):
        if self._dev is None:
            import jax.numpy as jnp

            self._dev = {
                name: tuple(jnp.asarray(x) for x in
                            (m.cols, m.cid, m.end, m.r0))
                for name, m in self.mats.items()
            }
            self._dev["coeff_tab"] = jnp.asarray(self.coeff_tab)
        return self._dev

    def eval3(self, z_dev, m_domain: int):
        """a/b/c = (A.z, B.z, C.z) as canonical int16 digit arrays
        [m_domain, L], device-resident.  ``z_dev``: canonical [n_vars, L]
        limb array (int16 ok)."""
        import jax

        if self._eval_jit is None:
            self._eval_jit = jax.jit(_eval_matrix,
                                     static_argnames=("span", "m_domain"))
        dev = self._device_arrays()
        tab = dev["coeff_tab"]
        out = {}
        for name in ("a", "b", "c"):
            cols, cid, end, r0 = dev[name]
            out[name] = self._eval_jit(
                z_dev, cols, cid, end, r0, tab,
                span=self.mats[name].span, m_domain=m_domain)
        return out["a"], out["b"], out["c"]

    # -- persistence --------------------------------------------------------

    def save(self, path: str):
        arrs = {"coeff_tab": self.coeff_tab,
                "meta": np.asarray([self.n_constraints, self.n_inputs,
                                    self.n_vars], np.int64)}
        for name, m in self.mats.items():
            arrs[f"{name}_cols"] = m.cols
            arrs[f"{name}_cid"] = m.cid
            arrs[f"{name}_end"] = m.end
            arrs[f"{name}_r0"] = m.r0
            arrs[f"{name}_meta"] = np.asarray([m.span, m.nnz], np.int64)
        arrs["format_version"] = np.asarray([FORMAT_VERSION], np.int64)
        arrs["digest"] = _content_digest(
            {k: v for k, v in arrs.items() if k != "digest"})
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **arrs)
        os.replace(tmp, path)

    @staticmethod
    def load(path: str) -> "CompiledConstraints":
        z = np.load(path)
        if "format_version" not in z or \
                int(z["format_version"][0]) != FORMAT_VERSION:
            raise ValueError(f"{path}: unsupported compiled-R1CS format")
        expect = _content_digest(
            {k: z[k] for k in z.files if k != "digest"})
        if not np.array_equal(expect, z["digest"]):
            raise ValueError(f"{path}: compiled-R1CS digest mismatch")
        mats = {}
        for name in ("a", "b", "c"):
            span, nnz = (int(x) for x in z[f"{name}_meta"])
            mats[name] = CompiledMatrix(
                z[f"{name}_cols"], z[f"{name}_cid"], z[f"{name}_end"],
                z[f"{name}_r0"], span, nnz)
        nc, ni, nv = (int(x) for x in z["meta"])
        return CompiledConstraints(mats, z["coeff_tab"], nc, ni, nv)


def _eval_matrix(z, cols, cid, end, r0, coeff_tab, *, span: int,
                 m_domain: int):
    """One matrix-vector product over Fr; see module docstring."""
    import jax.numpy as jnp
    from jax import lax

    from ..ops import field as F

    L = z.shape[-1]
    z = z.astype(jnp.int32)
    out = jnp.zeros((m_domain + span, L), jnp.int32)

    def body(out, chunk):
        cols_k, cid_k, end_k, r0_k = chunk
        zk = jnp.take(z, cols_k, axis=0)
        ck = jnp.take(coeff_tab, cid_k, axis=0).astype(jnp.int32)
        prod = F.mont_mul(F.FR, ck, zk)  # coeff * z * R, lazy limbs
        cs = jnp.cumsum(prod, axis=0, dtype=jnp.int32)
        cs = jnp.concatenate([jnp.zeros((1, L), jnp.int32), cs], axis=0)
        g = jnp.take(cs, end_k, axis=0)  # [span, L] row-boundary sums
        partial = g - jnp.concatenate(
            [jnp.zeros((1, L), jnp.int32), g[:-1]], axis=0)
        cur = lax.dynamic_slice(out, (r0_k, 0), (span, L))
        return lax.dynamic_update_slice(out, cur + partial, (r0_k, 0)), None

    out, _ = lax.scan(body, out, (cols, cid, end, r0))
    out = out[:m_domain]
    # rows hold sum(c*z*R) with limbs < MAX_ROW_TERMS * 2^12 < 2^27 and
    # value < MAX_ROW_TERMS * r < 2^270: three ripple rounds restore
    # 12-bit limbs exactly (no overflow out of limb L-1 since the value
    # fits), one fold brings the value under 2B, from_mont's REDC then
    # divides out the carried R and canonicalizes
    out = F._ripple(out, 3)
    out = F._fold(F.FR, out)
    out = F._ripple(out, 2)
    return F.from_mont(F.FR, out).astype(jnp.int16)


def compile_structure(term_rows, n_constraints: int, n_inputs: int,
                      n_vars: int, modulus: int) -> CompiledConstraints:
    """Build the chunked CSR arrays from recorded LC terms.

    ``term_rows``: list of (a_terms, b_terms, c_terms) per constraint,
    each a list of (Variable, int coeff).  Appends the prover's input
    consistency rows (a = z_i, b = c = 0; prover.rs:228-234) so the
    compiled A matrix covers all n_constraints + n_inputs rows.
    """
    from ..constants import FR_LIMBS, LIMB_BITS

    R2 = pow(2, 2 * FR_LIMBS * LIMB_BITS, modulus)
    coeff_ids: dict = {0: 0}
    coeff_vals = [0]

    def cid_of(c):
        c %= modulus
        i = coeff_ids.get(c)
        if i is None:
            i = coeff_ids[c] = len(coeff_vals)
            coeff_vals.append(c)
        return i

    streams = {}
    for mi, name in enumerate(("a", "b", "c")):
        rows, cols, cids = [], [], []
        ap_r, ap_c, ap_i = rows.append, cols.append, cids.append
        for r, terms3 in enumerate(term_rows):
            for v, c in terms3[mi]:
                i = cid_of(c)
                if i == 0:
                    continue
                ap_r(r)
                ap_c(v.index if v.kind == "input" else n_inputs + v.index)
                ap_i(i)
        if name == "a":  # input consistency rows
            one = cid_of(1)
            for j in range(n_inputs):
                ap_r(n_constraints + j)
                ap_c(j)
                ap_i(one)
        streams[name] = (rows, cols, cids)

    from ..ops import field as Ff
    from ..utils.limbs import ints_to_limbs_fast

    tab = ints_to_limbs_fast([c * R2 % modulus for c in coeff_vals],
                             Ff.FR.n_limbs).astype(np.int16)

    mats = {}
    total_rows = n_constraints + n_inputs
    for name, (rows, cols, cids) in streams.items():
        nnz = len(rows)
        rows = np.asarray(rows, np.int64)
        # per-row term count guard for the final reduction's value bound
        if nnz:
            counts = np.bincount(rows, minlength=total_rows)
            assert counts.max() <= MAX_ROW_TERMS, (
                f"{name}: a linear combination has {counts.max()} terms; "
                f"raise MAX_ROW_TERMS/fold ladder")
        S = min(CHUNK, max(1 << max(int(nnz - 1).bit_length(), 8), 256))
        C = max(-(-nnz // S), 1)
        pad = C * S - nnz
        last_row = int(rows[-1]) if nnz else 0
        rows = np.concatenate([rows, np.full(pad, last_row, np.int64)])
        cols_a = np.concatenate(
            [np.asarray(cols, np.int32), np.zeros(pad, np.int32)])
        cid_a = np.concatenate(
            [np.asarray(cids, np.int32), np.zeros(pad, np.int32)])
        r0 = rows[::S].astype(np.int32).copy()
        span = int(max(rows[k * S + S - 1] - rows[k * S] + 1
                       for k in range(C)))
        # Quantize span so the a/b/c matrices (and similar circuits)
        # share ONE compiled evaluator: gather lowering dominates the
        # XLA:TPU compile here (~minutes per distinct shape on the
        # remote-compile path).  Padded end entries repeat cs[S] and
        # contribute exactly zero.
        q = 8192 if span > 4096 else 256
        span = max(-(-span // q) * q, 1)
        end = np.empty((C, span), np.int32)
        for k in range(C):
            rel = rows[k * S:(k + 1) * S] - rows[k * S]
            end[k] = np.searchsorted(rel, np.arange(span), side="right")
        mats[name] = CompiledMatrix(cols_a.reshape(C, S),
                                    cid_a.reshape(C, S), end, r0,
                                    span, nnz)
    return CompiledConstraints(mats, tab, n_constraints, n_inputs, n_vars)


# -- in-process + on-disk structure cache -----------------------------------

_cache: dict = {}
_params_dir = [None]  # set by Parameters loading (ffi) for persistence


def set_params_dir(path):
    _params_dir[0] = path


def _disk_path(key: str):
    d = _params_dir[0]
    if not d or not key:
        return None
    safe = "".join(ch if ch.isalnum() or ch in "-_." else "_" for ch in key)
    return os.path.join(d, f"compiled-r1cs-{safe}.npz")


def get_structure(key):
    if not key:
        return None
    hit = _cache.get(key)
    if hit is not None:
        return hit
    path = _disk_path(key)
    if path and os.path.exists(path):
        try:
            hit = CompiledConstraints.load(path)
        except Exception:
            return None
        _cache[key] = hit
        return hit
    return None


def put_structure(key, compiled: CompiledConstraints):
    if not key:
        return
    _cache[key] = compiled
    path = _disk_path(key)
    if path:
        try:
            compiled.save(path)
        except OSError:
            pass
