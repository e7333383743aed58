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


# ------------------- char-level helpers + production-path strategies -------

def test_char_occurrences_overlapping():
    from deepkg_spark.operators.offsets import char_occurrences

    assert char_occurrences("aaaa", "aa") == [0, 1, 2]
    assert char_occurrences("abcabc", "abc") == [0, 3]
    assert char_occurrences("abc", "") == []
    assert char_occurrences("abc", "zz") == []


def test_closest_char_pair_divergence_and_ties():
    from deepkg_spark.operators.offsets import closest_char_pair

    # 'mod1' occurs at 0 and 20; anchor 'fn9' at 12 -> closest picks 20
    text = "mod1 padpadpad fn9 x mod1"
    assert text.index("fn9") == 15  # sanity of the fixture itself
    assert closest_char_pair(text, "fn9", "mod1") == (15, 21)
    # first-occurrence semantics would have picked 0 — a real divergence
    # tie on |gap|: earliest (anchor, arg) wins
    t2 = "b a b"
    assert closest_char_pair(t2, "a", "b") == (2, 0)
    # missing either side -> None
    assert closest_char_pair(t2, "zz", "b") is None
    assert closest_char_pair(t2, "a", "zz") is None


def test_longer_first_char_assign_greedy_collision():
    from deepkg_spark.operators.offsets import longer_first_char_assign

    # spans sorted by char length desc: 'abc' first takes [0,3); 'ab'
    # overlaps there, dodges to its occurrence at 4
    text = "abc ab"
    assert longer_first_char_assign(text, ["ab", "abc"]) == {1: 0, 0: 4}
    # unplaceable shorter span is dropped
    assert longer_first_char_assign("abc", ["ab", "abc"]) == {1: 0}


def test_triples_udf_offset_strategies(spark, sf_dir):
    """Production path: 'closest' drops records whose subject (file-id)
    never occurs in content and keeps calls/extends with the closest pair;
    'longer_first' assigns non-overlapping slots; 'first' unchanged."""
    from deepkg_spark.operators.relations import triples_udf
    from deepkg_spark.sources.corpus import load_corpus

    corpus = load_corpus(spark, sf_dir)
    first = triples_udf(corpus).collect()
    closest = triples_udf(corpus, offset_strategy="closest").collect()
    lf = triples_udf(corpus, offset_strategy="longer_first").collect()
    preds_first = {r["pred"] for r in first}
    assert preds_first == {"imports", "defines", "calls", "extends"}
    for rows in (closest, lf):
        assert {r["pred"] for r in rows} == {"calls", "extends"}
        assert all(r["subj_start"] >= 0 and r["obj_start"] >= 0 for r in rows)
    # on the single-occurrence grammar the surviving offsets agree with
    # 'first' record-by-record
    key = lambda r: (r["repo"], r["path"], r["pred"])
    f_map = {key(r): (r["subj_start"], r["obj_start"]) for r in first
             if r["pred"] in ("calls", "extends")}
    for r in closest:
        assert (r["subj_start"], r["obj_start"]) == f_map[key(r)]
    import pytest

    with pytest.raises(ValueError):
        triples_udf(corpus, offset_strategy="nope")


def test_events_closest_strategy_diverges(spark, sf_dir):
    """Event path: under 'closest' the callee role re-matches to the
    occurrence AT the trigger (distance 0) instead of its first occurrence
    at char 7 — divergence on every row; caller unchanged."""
    from deepkg_spark.operators.sel import sel_roundtrip_events
    from deepkg_spark.sources.corpus import load_corpus

    corpus = load_corpus(spark, sf_dir)
    first = {(r["repo"], r["path"], r["role"]): r
             for r in sel_roundtrip_events(corpus).collect()}
    closest = {(r["repo"], r["path"], r["role"]): r
               for r in sel_roundtrip_events(
                   corpus, offset_strategy="closest").collect()}
    assert set(first) == set(closest) and first
    for k, c in closest.items():
        f = first[k]
        assert c["trigger_start"] == f["trigger_start"]
        if k[2] == "callee":
            assert f["arg_start"] == 7
            assert c["arg_start"] == c["trigger_start"]
        else:
            assert c["arg_start"] == f["arg_start"]
