"""Placeholder crate mirror (reference: zcash_proofs/src/lib.rs, an empty
stub crate reserved for the proving-parameter tooling)."""
