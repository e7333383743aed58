"""Registry window-rotation policy (mechanical enforcement).

The external driver verifies only the FIRST 50 entries of queries() each
round; registry_windows.json records each round's 50-entry window. The
policy (documented in __spark_entry__.queries): every query must have an
official CORRECTNESS row at most one round old, i.e. every registry entry
appears in the current round's window or the previous round's window, and
the current window must match the live registry order exactly.
"""

import importlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def _load():
    entrymod = importlib.import_module("__spark_entry__")
    manifest = json.load(open(os.path.join(REPO, "registry_windows.json")))
    return entrymod, manifest


def test_round_keys_are_zero_padded():
    """Keys are r{NN} (zero-padded) so lexicographic sort == round order —
    'r10' would otherwise sort before 'r3'."""
    _, manifest = _load()
    for k in manifest:
        assert len(k) == 3 and k[0] == "r" and k[1:].isdigit(), k


def test_manifest_matches_live_registry():
    """The newest manifest entry IS the live first-50 ordering (a registry
    edit without a manifest update fails here, forcing the rotation
    bookkeeping to stay current)."""
    entrymod, manifest = _load()
    newest = sorted(manifest)[-1]
    live = list(entrymod.queries().keys())[:WINDOW]
    assert manifest[newest] == live


def test_every_query_has_a_window_at_most_one_round_old():
    """Every registry entry (oracle-bearing AND rows-only) sits in the
    current or the previous round's 50-entry window — so no query's
    official driver evidence can silently go stale beyond one round."""
    entrymod, manifest = _load()
    rounds = sorted(manifest)
    current, previous = set(manifest[rounds[-1]]), set(manifest[rounds[-2]])
    stale = [q for q in entrymod.queries() if q not in current | previous]
    assert stale == [], f"queries older than one round of official rows: {stale}"


def test_windows_are_well_formed():
    entrymod, manifest = _load()
    names = set(entrymod.queries().keys())
    for rnd, window in manifest.items():
        assert len(window) == WINDOW, rnd
        assert len(set(window)) == WINDOW, f"{rnd}: duplicate names"
    # current-window names must all exist in the live registry
    newest = sorted(manifest)[-1]
    assert set(manifest[newest]) <= names


def test_every_window_query_has_oracle_or_is_rows_only():
    """Every windowed query either carries a DuckDB oracle (exact check) or
    is one of the documented rows-only cores — nothing unverifiable gets
    window slots."""
    entrymod, manifest = _load()
    oracles = set(entrymod.oracle_sql().keys())
    # round 5 oracle-certified every formerly rows-only query: the four
    # factored scorer heads, the DP segmenter, and finally the quality-loop
    # classifier itself (stumps_q + phrase_quality_duck_sql) — the rows-only
    # set is empty
    rows_only: set[str] = set()
    newest = sorted(manifest)[-1]
    missing = [q for q in manifest[newest] if q not in oracles | rows_only]
    assert missing == [], missing
