"""Offset-assignment strategies for mapping extracted surface strings back
to token positions.

Re-implements (from scratch) the reference's three strategies for turning
string-level records into offset-level records (citations into
/root/reference/UIE_torch/uie/evaluation/sel2record.py):
- match_sublist semantics (:99-117): all contiguous occurrences of a token
  subsequence.
- 'first' (:312-328): each argument takes its first occurrence.
- 'closest' (:470-519, record_to_offset_closest_role): among all occurrence
  pairs of (anchor, argument) pick the pair minimizing the positional gap;
  ties resolve to the earliest pair (deterministic).
- 'longer_first' (:367-402): candidate surfaces sorted by token length
  descending are greedily assigned non-overlapping occurrences.

All pure deterministic Python, designed to run inside Arrow batches (they
take token lists, not DataFrames); property/unit tests in
tests/test_offsets.py.
"""

from __future__ import annotations


def match_sublist(tokens: list[str], span: list[str]) -> list[tuple[int, int]]:
    """All (start, end_inclusive) occurrences of `span` in `tokens`."""
    n, m = len(tokens), len(span)
    if m == 0 or m > n:
        return []
    return [
        (i, i + m - 1) for i in range(n - m + 1) if tokens[i : i + m] == span
    ]


def first_offset(tokens: list[str], span: list[str]) -> tuple[int, int] | None:
    occ = match_sublist(tokens, span)
    return occ[0] if occ else None


def closest_offset(
    tokens: list[str], anchor: list[str], arg: list[str]
) -> tuple[tuple[int, int], tuple[int, int]] | None:
    """(anchor_occ, arg_occ) minimizing |anchor_start - arg_start|; ties ->
    earliest (anchor_start, arg_start). None when either never occurs."""
    a_occ = match_sublist(tokens, anchor)
    b_occ = match_sublist(tokens, arg)
    if not a_occ or not b_occ:
        return None
    best = min(
        ((a, b) for a in a_occ for b in b_occ),
        key=lambda p: (abs(p[0][0] - p[1][0]), p[0][0], p[1][0]),
    )
    return best


def longer_first_assign(
    tokens: list[str], spans: list[list[str]]
) -> dict[int, tuple[int, int]]:
    """Greedy non-overlapping assignment, longest span first.

    Returns {span_index: (start, end_inclusive)} for the spans that got a
    slot. Sort order: token length desc, then original index asc (stable,
    deterministic). A span takes its earliest occurrence that does not
    overlap an already-taken region; spans with no free occurrence are
    dropped (left unassigned).
    """
    order = sorted(range(len(spans)), key=lambda i: (-len(spans[i]), i))
    taken: list[tuple[int, int]] = []
    out: dict[int, tuple[int, int]] = {}
    for i in order:
        for s, e in match_sublist(tokens, spans[i]):
            if all(e < ts or s > te for ts, te in taken):
                taken.append((s, e))
                out[i] = (s, e)
                break
    return out
