"""In-circuit Pedersen hash (re-design of ``circuit/pedersen_hash.rs``).

Accumulates 3-bit signed-digit chunks into per-segment Montgomery sums via
2-bit lookups with conditional negation, converts each segment to Edwards
form, and adds the segments.  Golden: 2x255 input bits with the
NoteCommitment personalization cost exactly 1377 constraints
(pedersen_hash.rs test_pedersen_hash_constraints).
"""

from __future__ import annotations

from ..protocol import jubjub as J
from .boolean import Boolean
from .ecc import EdwardsPoint, MontgomeryPoint
from .lookup import lookup3_xy_with_conditional_negation


def pedersen_hash(cs, name: str, personalization_bits, bits) -> EdwardsPoint:
    """`personalization_bits` is the 6-bool personalization prefix
    (protocol.jubjub.note_commitment_personalization / merkle_tree_...)."""
    assert len(personalization_bits) == 6
    all_bits = [Boolean.constant(b) for b in personalization_bits] + list(bits)
    segment_generators = J.JubjubParams().pedersen_circuit_generators

    edwards_result = None
    pos = 0
    segment_i = 0
    n = len(all_bits)
    false = Boolean.constant(False)
    while pos < n:
        windows = segment_generators[segment_i]
        segment_result = None
        window_i = 0
        while pos < n:
            a = all_bits[pos]
            b = all_bits[pos + 1] if pos + 1 < n else false
            c = all_bits[pos + 2] if pos + 2 < n else false
            pos += 3

            x, y = lookup3_xy_with_conditional_negation(
                cs, f"{name}/segment {segment_i}, window {window_i}",
                [a, b, c], windows[window_i],
            )
            tmp = MontgomeryPoint.interpret_unchecked(x, y)
            if segment_result is None:
                segment_result = tmp
            else:
                segment_result = tmp.add(
                    cs,
                    f"{name}/addition of segment {segment_i}, window {window_i}",
                    segment_result,
                )
            if window_i + 1 == len(windows):
                window_i += 1
                break
            window_i += 1

        seg_ed = segment_result.into_edwards(
            cs, f"{name}/conversion of segment {segment_i} into edwards"
        )
        if edwards_result is None:
            edwards_result = seg_ed
        else:
            edwards_result = seg_ed.add(
                cs,
                f"{name}/addition of segment {segment_i} to accumulator",
                edwards_result,
            )
        segment_i += 1

    assert edwards_result is not None
    return edwards_result
