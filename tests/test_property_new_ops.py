"""Hypothesis property tests for the round-4 operators, engine-free:
the DuckDB oracle SQL (the exact formulation the Spark plans must match,
proven equivalent by the contract sweep) is checked against brute-force
pure-Python references on randomized inputs. No SparkSession — these run
in milliseconds and explore corners the fixtures cannot."""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from deepkg_spark.operators.curation import profile_quantiles_duck_sql
from deepkg_spark.operators.dedup import substring_spans_duck_sql
from deepkg_spark.operators.events import asof_join_duck_sql

# ---------------------------------------------------------------- substr


def _brute_spans(docs, w=8):
    """Reference: per doc, flag every w-window whose joined-token gram
    occurs >= 2 times across the corpus; merge overlapping/adjacent."""
    from collections import Counter

    grams = Counter()
    wins = {}
    for doc_id, toks in docs:
        wins[doc_id] = []
        for i in range(len(toks) - w + 1):
            g = " ".join(toks[i : i + w])
            grams[g] += 1
            wins[doc_id].append((i, g))
    out = set()
    for doc_id, lst in wins.items():
        dup = [i for i, g in lst if grams[g] >= 2]
        if not dup:
            continue
        start = prev = dup[0]
        for i in dup[1:]:
            if i - prev > w:
                out.add((doc_id, start, prev + w, prev + w - start))
                start = i
            prev = i
        out.add((doc_id, start, prev + w, prev + w - start))
    return out


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=24),
        min_size=1,
        max_size=8,
    )
)
def test_substring_spans_matches_bruteforce(tokses):
    docs = [(i, toks) for i, toks in enumerate(tokses)]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany(
        "INSERT INTO d VALUES (?, ?)", [(i, " ".join(t)) for i, t in docs]
    )
    got = {tuple(r) for r in con.execute(substring_spans_duck_sql("d")).fetchall()}
    assert got == _brute_spans(docs)


# ---------------------------------------------------------------- quantiles


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=200,
    )
)
def test_quantiles_match_numpy_linear(vals):
    import numpy as np

    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    row = con.execute(profile_quantiles_duck_sql("t", ("x",))).fetchone()
    _, n, q25, q50, q75 = row
    assert n == len(vals)
    want = np.percentile(vals, [25, 50, 75], method="linear")
    for got, exp in zip((q25, q50, q75), want):
        # both sides round to 6; allow 1 ulp of that rounding
        assert abs(got - round(float(exp), 6)) <= 1.5e-6, (got, exp, vals)


# ---------------------------------------------------------------- asof


def _brute_asof(rights, lefts):
    """Reference: per left event, latest right with (ts, event_id) <=
    ordering; ties at equal ts resolved right-before-left, max event_id."""
    out = {}
    for lid, luser, lts in lefts:
        best = None
        for rid, ruser, rts, rval in rights:
            if ruser == luser and (rts < lts or rts == lts):
                k = (rts, rid)
                if best is None or k > (best[2], best[0]):
                    best = (rid, rval, rts)
        out[lid] = best
    return out


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),              # user
            st.integers(0, 50),             # ts seconds
            st.booleans(),                  # is_left
        ),
        min_size=1,
        max_size=30,
    )
)
def test_asof_join_matches_bruteforce(evs):
    rows = []
    for i, (user, ts, is_left) in enumerate(evs):
        rows.append(
            (i, ts, user, "purchase" if is_left else "click", float(i) / 4)
        )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, to_timestamp(?), ?, ?, ?)", rows
    )
    got = {
        r[0]: (r[3], r[4]) for r in con.execute(asof_join_duck_sql()).fetchall()
    }
    rights = [(i, u, t, v) for (i, t, u, ty, v) in rows if ty == "click"]
    lefts = [(i, u, t) for (i, t, u, ty, v) in rows if ty == "purchase"]
    want = _brute_asof(rights, lefts)
    assert set(got) == set(want)
    for lid, best in want.items():
        if best is None:
            assert got[lid] == (None, None)
        else:
            rid, rval, _ = best
            assert got[lid] == (rid, round(rval, 6))
