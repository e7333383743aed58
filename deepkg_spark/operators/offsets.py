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


def closest_pairs_frame(docs):
    """Contract surface for the 'closest' strategy (sel2record.py:470-519):
    per document, anchor = the FIRST bigram of the whitespace token list,
    argument = the LAST bigram; among all (anchor, argument) occurrence
    pairs pick the one minimizing |anchor_start - arg_start| (ties ->
    earliest anchor, then earliest arg). Docs with < 2 tokens are skipped.

    Arrow mapInPandas over (doc_id, text) -> (doc_id, a_start, a_end,
    b_start, b_end), closed intervals, 0-based token positions. The heavy
    repetition in the fixture corpus makes 'closest' genuinely diverge from
    'first' (the last bigram usually also occurs early in the doc).
    One narrow stage — no shuffle; the per-doc occurrence scan is O(n*m).
    """
    from collections.abc import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "a_start", "a_end", "b_start", "b_end")}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in (text or "").split(" ") if t]
                if len(toks) < 2:
                    continue
                pair = closest_offset(toks, toks[:2], toks[-2:])
                if pair is None:
                    continue
                (a_s, a_e), (b_s, b_e) = pair
                out["doc_id"].append(doc_id)
                out["a_start"].append(a_s)
                out["a_end"].append(a_e)
                out["b_start"].append(b_s)
                out["b_end"].append(b_e)
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        run, schema="doc_id bigint, a_start int, a_end int, b_start int, b_end int"
    )


def closest_pairs_duck_sql(docs_rel: str) -> str:
    """DuckDB oracle: enumerate bigram occurrences positionally, then the
    arithmetic min over (|gap|, a_start, b_start) — row_number as min_by
    with the full deterministic tie-break."""
    toks = "list_filter(string_split(text, ' '), x -> x <> '')"
    return f"""
WITH t AS (
  SELECT doc_id, {toks} AS toks FROM {docs_rel}
), ok AS (
  SELECT doc_id, toks FROM t WHERE len(toks) >= 2
), pos AS (
  SELECT doc_id, toks, CAST(unnest(range(len(toks) - 1)) AS INT) AS p FROM ok
), occ_a AS (
  SELECT doc_id, p FROM pos
  WHERE toks[p + 1] = toks[1] AND toks[p + 2] = toks[2]
), occ_b AS (
  SELECT doc_id, p FROM pos
  WHERE toks[p + 1] = toks[len(toks) - 1] AND toks[p + 2] = toks[len(toks)]
), pairs AS (
  SELECT a.doc_id, a.p AS ap, b.p AS bp,
         row_number() OVER (PARTITION BY a.doc_id
                            ORDER BY abs(a.p - b.p), a.p, b.p) AS rn
  FROM occ_a a JOIN occ_b b USING (doc_id)
)
SELECT doc_id, ap AS a_start, ap + 1 AS a_end, bp AS b_start, bp + 1 AS b_end
FROM pairs WHERE rn = 1
""".strip()


def longer_first_frame(docs):
    """Contract surface for the 'longer_first' strategy (sel2record.py:
    367-402): per document the span list is [last bigram, first unigram];
    sorted by token length descending the bigram assigns first (earliest
    occurrence — no prior overlap), then the unigram takes its earliest
    occurrence NOT overlapping the bigram's slot, or is dropped. Emits
    (doc_id, span_idx, start, end) closed intervals; span_idx 0 = bigram,
    1 = unigram. Because token 0 IS the first unigram, the overlap dodge
    fires exactly when the last bigram's earliest occurrence covers an
    early duplicate — a real greedy-collision exercise, SQL-expressible.
    """
    from collections.abc import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "span_idx", "start", "end")}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in (text or "").split(" ") if t]
                if len(toks) < 2:
                    continue
                spans = [toks[-2:], [toks[0]]]
                for idx, (s, e) in sorted(longer_first_assign(toks, spans).items()):
                    out["doc_id"].append(doc_id)
                    out["span_idx"].append(idx)
                    out["start"].append(s)
                    out["end"].append(e)
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        run, schema="doc_id bigint, span_idx int, start int, end int"
    )


def longer_first_duck_sql(docs_rel: str) -> str:
    """DuckDB oracle for the two-span greedy: bigram slot = min occurrence,
    unigram slot = min occurrence position strictly outside the bigram's
    closed interval (dropped when none exists)."""
    toks = "list_filter(string_split(text, ' '), x -> x <> '')"
    return f"""
WITH t AS (
  SELECT doc_id, {toks} AS toks FROM {docs_rel}
), ok AS (
  SELECT doc_id, toks FROM t WHERE len(toks) >= 2
), pos AS (
  SELECT doc_id, toks, CAST(unnest(range(len(toks))) AS INT) AS p FROM ok
), big AS (
  SELECT doc_id, CAST(min(p) AS INT) AS s FROM pos
  WHERE p < len(toks) - 1
    AND toks[p + 1] = toks[len(toks) - 1] AND toks[p + 2] = toks[len(toks)]
  GROUP BY doc_id
), uni AS (
  SELECT pos.doc_id, CAST(min(p) AS INT) AS s FROM pos JOIN big USING (doc_id)
  WHERE toks[p + 1] = toks[1] AND (p < big.s OR p > big.s + 1)
  GROUP BY pos.doc_id
)
SELECT doc_id, 0 AS span_idx, s AS start, s + 1 AS "end" FROM big
UNION ALL
SELECT doc_id, 1, s, s FROM uni
""".strip()


def char_occurrences(text: str, span: str) -> list[int]:
    """All (possibly overlapping) char start positions of `span` in `text` —
    the char-level analogue of match_sublist (sel2record.py:99-117)."""
    if not span:
        return []
    out, i = [], text.find(span)
    while i >= 0:
        out.append(i)
        i = text.find(span, i + 1)
    return out


def closest_char_pair(
    text: str, anchor: str, arg: str
) -> tuple[int, int] | None:
    """(anchor_start, arg_start) minimizing (|gap|, anchor_start, arg_start)
    over all char occurrence pairs — the char-level analogue of the
    relation 'closest' strategy (record_to_offset_closest_role,
    sel2record.py:470-519: distance_tuple.sort() on (distance, arg1_match,
    arg2_match)). None when either surface never occurs."""
    a_occ = char_occurrences(text, anchor)
    b_occ = char_occurrences(text, arg)
    if not a_occ or not b_occ:
        return None
    return min(
        ((a, b) for a in a_occ for b in b_occ),
        key=lambda p: (abs(p[0] - p[1]), p[0], p[1]),
    )


def longer_first_char_assign(
    text: str, spans: list[str]
) -> dict[int, int]:
    """Greedy non-overlapping char assignment, longest span first (the
    char-level analogue of record_to_offset_longer_first,
    sel2record.py:367-402): sort by length desc (original index asc on
    ties), each span takes its earliest occurrence whose [start, start+len)
    window does not overlap an already-taken window; unplaceable spans are
    dropped. Returns {span_index: start}."""
    order = sorted(range(len(spans)), key=lambda i: (-len(spans[i]), i))
    taken: list[tuple[int, int]] = []
    out: dict[int, int] = {}
    for i in order:
        n = len(spans[i])
        for s in char_occurrences(text, spans[i]):
            if all(s + n <= ts or s >= te for ts, te in taken):
                taken.append((s, s + n))
                out[i] = s
                break
    return out


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
