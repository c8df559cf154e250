"""Circuit gadget library + Sapling/Sprout circuits.

Re-design of ``sapling-crypto/src/circuit/``: the R1CS gadgets (boolean,
num, uint32, multieq, multipack, lookup, ecc, pedersen_hash, blake2s,
sha256) and the production circuits (Sapling Spend/Output, Sprout
JoinSplit).  Constraint shapes are replicated faithfully — the pinned
constraint counts (Spend 98,777 / Output 7,827 / Sprout 1,989,085;
circuit/sapling/mod.rs:715,792, circuit/sprout/mod.rs:465) are the parity
tests.  Synthesis is host-side (as in the reference); the proving NTT/MSM
work runs on TPU.
"""
