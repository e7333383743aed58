"""Offset strategies: first / closest / longer_first (sel2record semantics)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from deepkg_spark.operators.offsets import (
    closest_offset,
    first_offset,
    longer_first_assign,
    match_sublist,
)

TOKS = "a b c a b a c b a".split()


def test_match_sublist_all_occurrences():
    assert match_sublist(TOKS, ["a", "b"]) == [(0, 1), (3, 4)]
    assert match_sublist(TOKS, ["a"]) == [(0, 0), (3, 3), (5, 5), (8, 8)]
    assert match_sublist(TOKS, ["z"]) == []
    assert match_sublist(TOKS, []) == []


def test_first_offset():
    assert first_offset(TOKS, ["a", "b"]) == (0, 1)
    assert first_offset(TOKS, ["z"]) is None


def test_closest_offset_picks_min_gap():
    # anchor 'c' occurs at 2 and 6; arg 'b' at 1, 4, 7. Gap-1 pairs:
    # (2,1) and (6,7); the tie resolves to the EARLIEST anchor -> ((2,2),(1,1))
    assert closest_offset(TOKS, ["c"], ["b"]) == ((2, 2), (1, 1))
    assert closest_offset(TOKS, ["z"], ["b"]) is None
    # no tie: single minimal pair wins
    toks = "b x x c x b".split()
    assert closest_offset(toks, ["c"], ["b"]) == ((3, 3), (5, 5))


def test_closest_tie_break_earliest():
    toks = "x y x".split()
    # anchor 'y' at 1; arg 'x' at 0 and 2, both gap 1 -> earliest arg wins
    assert closest_offset(toks, ["y"], ["x"]) == ((1, 1), (0, 0))


def test_longer_first_greedy_non_overlapping():
    toks = "big red fox big red".split()
    spans = [["red"], ["big", "red"], ["fox"]]
    got = longer_first_assign(toks, spans)
    # 'big red' (longest) takes (0,1); 'red' must use the second occurrence
    assert got[1] == (0, 1)
    assert got[0] == (4, 4)
    assert got[2] == (2, 2)


def test_longer_first_drops_unplaceable():
    toks = "a b".split()
    spans = [["a", "b"], ["a"]]
    got = longer_first_assign(toks, spans)
    assert got == {0: (0, 1)}  # 'a' has no non-overlapping slot left


@given(
    st.lists(st.sampled_from("ab"), min_size=1, max_size=12),
    st.lists(st.sampled_from("ab"), min_size=1, max_size=3),
)
@settings(max_examples=200, deadline=None)
def test_match_sublist_property(tokens, span):
    for s, e in match_sublist(tokens, span):
        assert tokens[s : e + 1] == span
    # completeness: any manual scan hit is reported
    hits = [
        i for i in range(len(tokens) - len(span) + 1)
        if tokens[i : i + len(span)] == span
    ]
    assert [s for s, _ in match_sublist(tokens, span)] == hits
