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


def test_closest_pairs_contract(spark, sf_dir):
    """Spark 'closest' strategy frame == DuckDB min-over-(|gap|, a, b)
    oracle, and the strategy genuinely diverges from 'first' somewhere."""
    from deepkg_spark.operators.offsets import (
        closest_pairs_duck_sql,
        closest_pairs_frame,
        first_offset,
    )
    from tests.compare import compare_spark_duck, duck_connect

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    df = closest_pairs_frame(docs)
    compare_spark_duck(df, duck_connect(sf_dir), closest_pairs_duck_sql("documents"))
    # divergence proof: at least one doc's closest arg slot is not its first
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    diverged = 0
    for r in df.collect():
        toks = [t for t in texts[r["doc_id"]].split(" ") if t]
        first = first_offset(toks, toks[-2:])
        if first and first[0] != r["b_start"]:
            diverged += 1
    assert diverged > 0


def test_longer_first_contract(spark, sf_dir):
    """Spark 'longer_first' greedy frame == the two-span DuckDB oracle; the
    overlap dodge demonstrably fires (some unigram slot is not position 0)
    and some unigram is dropped or displaced."""
    from deepkg_spark.operators.offsets import (
        longer_first_duck_sql,
        longer_first_frame,
    )
    from tests.compare import compare_spark_duck, duck_connect

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    df = longer_first_frame(docs)
    compare_spark_duck(df, duck_connect(sf_dir), longer_first_duck_sql("documents"))
    # invariant: an assigned unigram slot never overlaps its doc's bigram slot
    # (the dodge itself is pinned by test_longer_first_frame_hand_case)
    rows = df.collect()
    big = {r["doc_id"]: (r["start"], r["end"]) for r in rows if r["span_idx"] == 0}
    for r in rows:
        if r["span_idx"] == 1:
            s, e = big[r["doc_id"]]
            assert r["start"] < s or r["start"] > e


def test_longer_first_frame_hand_case(spark):
    """Pinned greedy semantics: bigram takes its earliest occurrence, the
    unigram dodges the overlap or drops."""
    from deepkg_spark.operators.offsets import longer_first_frame

    docs = spark.createDataFrame(
        [
            # toks: a b ... a b  -> last bigram (a,b) earliest occ at 0;
            # unigram 'a' overlaps at 0, next free occurrence at 3
            (1, "a b c a b"),
            # toks: a b -> bigram at 0, unigram unplaceable -> dropped
            (2, "a b"),
        ],
        "doc_id bigint, text string",
    )
    rows = {(r["doc_id"], r["span_idx"]): (r["start"], r["end"])
            for r in longer_first_frame(docs).collect()}
    assert rows[(1, 0)] == (0, 1) and rows[(1, 1)] == (3, 3)
    assert rows[(2, 0)] == (0, 1) and (2, 1) not in rows
