"""Relation classification -> (subj, pred, obj) triples (the edge emitter).

Reference semantics (citations into /root/reference/):
- RelationRecord tuples (rel_type, arg1_type, arg1, arg2_type, arg2):
  UIE_torch/uie/evaluation/sel2record.py:405-438.
- per-doc duplicate suppression (de_duplicate): sel2record.py:463-466, 514-517.
- records are built per document from detected spots + their asocs
  (sel2record.py:1110-1187); here the deterministic grammar plays the role of
  the generative model, and the record-building/dedup semantics are preserved.

Physical strategies:
1. ``triples_frame(corpus)`` — JVM-only: regexp extraction + array_distinct
   (per-doc dedup is NARROW — no shuffle) + explode + union. At 100 TB this is
   a single scan with whole-stage codegen and zero exchanges.
2. ``triples_udf(corpus)``  — Arrow ``mapInPandas`` building records per doc
   from the span scorer (the mandated vectorized-UDF shape; also carries
   char offsets for offset-level scoring).
3. ``gold_triples_sql()``   — engine-portable SQL deriving the SAME triples
   arithmetically from doc_id (independent derivation = the test fixture;
   extraction vs gold must score P/R = 1.0).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_COLS = ["repo", "path", "subj", "subj_type", "pred", "obj", "obj_type"]

TRIPLE_SCHEMA = (
    "repo string, path string, subj string, subj_type string, pred string, "
    "obj string, obj_type string, subj_start int, obj_start int"
)


# ---------------------------------------------------------------- JVM path

def triples_frame(corpus: DataFrame) -> DataFrame:
    """All four predicates in ONE scan: each row projects an array of triple
    structs (imports exploded, defines/calls/extends appended), then a single
    explode. No Python, no shuffle, one pass over content — at corpus scale
    this is 4x less scan+regex work than a union of per-predicate branches.
    """
    fid = "concat_ws('/', repo, path)"
    rec = "named_struct('subj', {s}, 'subj_type', {st}, 'pred', {p}, 'obj', {o}, 'obj_type', {ot})"
    imports = (
        "transform(array_distinct(regexp_extract_all(content, 'import (mod[0-9]+)', 1)), "
        + "m -> "
        + rec.format(s=fid, st="'file'", p="'imports'", o="m", ot="'module'")
        + ")"
    )
    defines = rec.format(
        s=fid, st="'file'", p="'defines'",
        o="regexp_extract(content, 'def (fn[0-9]+)', 1)", ot="'function'",
    )
    calls = rec.format(
        s="regexp_extract(content, 'def (fn[0-9]+)', 1)", st="'function'",
        p="'calls'",
        o="concat(regexp_extract(content, 'return (mod[0-9]+)', 1), '.call')",
        ot="'callable'",
    )
    extends = rec.format(
        s="regexp_extract(content, 'class (Cls[0-9]+)', 1)", st="'class'",
        p="'extends'",
        o="regexp_extract(content, '[(](Base[0-9]+)[)]', 1)", ot="'class'",
    )
    return (
        corpus.select(
            "repo",
            "path",
            F.explode(
                F.expr(f"concat({imports}, array({defines}, {calls}, {extends}))")
            ).alias("t"),
        )
        .select(
            "repo", "path", "t.subj", "t.subj_type", "t.pred", "t.obj", "t.obj_type"
        )
    )


# ---------------------------------------------------------------- UDF path

_IMPORT_RE = re.compile(r"import (mod[0-9]+)")
_DEF_RE = re.compile(r"def (fn[0-9]+)")
_RETURN_RE = re.compile(r"return (mod[0-9]+)")
_CLASS_RE = re.compile(r"class (Cls[0-9]+)\((Base[0-9]+)\)")


OFFSET_STRATEGIES = ("first", "closest", "longer_first")


def _doc_records(
    repo: str, path: str, content: str, offset_strategy: str = "first"
) -> list[tuple]:
    """Build per-doc relation records with dedup + char offsets.

    Mirrors sel2record record building: per-doc seen-set dedup
    (sel2record.py:463-466) and the map_config offset strategy
    (sel2record.py:312-328):

    - 'first' (record_to_offset_first_role, :440-468): each argument takes
      the first occurrence the extractor saw (regex match positions; the
      file-id subject of imports/defines never occurs in content and gets
      subj_start = -1).
    - 'closest' (record_to_offset_closest_role, :470-519): the (subj, obj)
      occurrence pair minimizing (|gap|, subj_start, obj_start); records
      where EITHER surface has no occurrence in content are dropped — so
      imports/defines (file-id subject) vanish under this strategy, exactly
      as the reference drops un-reconstructable args. (Deviation, on
      purpose: the reference `break`s out of the whole per-doc record loop
      on the first unfound arg, silently discarding unrelated later
      records; this engine drops per-record.)
    - 'longer_first' (record_to_offset_longer_first, :367-402, the entity
      strategy applied to the record's span list): subj and obj greedily
      take non-overlapping earliest occurrences, longest surface first;
      records where either span finds no free slot are dropped.
    """
    from deepkg_spark.operators.offsets import (
        closest_char_pair,
        longer_first_char_assign,
    )

    if offset_strategy not in OFFSET_STRATEGIES:
        raise ValueError(
            f"offset_strategy must be one of {OFFSET_STRATEGIES}, "
            f"got {offset_strategy!r}"
        )
    file_id = f"{repo}/{path}"
    seen: set[tuple] = set()
    out: list[tuple] = []

    def emit(subj, subj_type, pred, obj, obj_type, subj_start, obj_start):
        key = (subj, subj_type, pred, obj, obj_type)
        if key in seen:
            return
        seen.add(key)
        if offset_strategy == "closest":
            pair = closest_char_pair(content, subj, obj)
            if pair is None:
                return
            subj_start, obj_start = pair
        elif offset_strategy == "longer_first":
            slots = longer_first_char_assign(content, [subj, obj])
            if 0 not in slots or 1 not in slots:
                return
            subj_start, obj_start = slots[0], slots[1]
        out.append((repo, path, *key, subj_start, obj_start))

    for m in _IMPORT_RE.finditer(content):
        emit(file_id, "file", "imports", m.group(1), "module", -1, m.start(1))
    dm = _DEF_RE.search(content)
    if dm:
        emit(file_id, "file", "defines", dm.group(1), "function", -1, dm.start(1))
        rm = _RETURN_RE.search(content)
        if rm:
            emit(
                dm.group(1), "function", "calls", rm.group(1) + ".call",
                "callable", dm.start(1), rm.start(1),
            )
    cm = _CLASS_RE.search(content)
    if cm:
        emit(cm.group(1), "class", "extends", cm.group(2), "class",
             cm.start(1), cm.start(2))
    return out


def triples_udf(corpus: DataFrame, offset_strategy: str = "first") -> DataFrame:
    """Arrow-batched record building: one narrow mapInPandas stage.

    ``offset_strategy`` selects the production offset-mapping strategy
    ('first' | 'closest' | 'longer_first'), mirroring the reference's
    map_config option (sel2record.py:312-328) — see _doc_records."""
    if offset_strategy not in OFFSET_STRATEGIES:
        raise ValueError(
            f"offset_strategy must be one of {OFFSET_STRATEGIES}, "
            f"got {offset_strategy!r}"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = TRIPLE_COLS + ["subj_start", "obj_start"]
        for pdf in batches:
            recs: list[tuple] = []
            for repo, path, content in zip(pdf["repo"], pdf["path"], pdf["content"]):
                recs.extend(_doc_records(repo, path, content, offset_strategy))
            yield pd.DataFrame(recs, columns=cols)

    return corpus.select("repo", "path", "content").mapInPandas(
        extract, schema=TRIPLE_SCHEMA
    )


def triples_duck_sql(corpus_rel: str = "corpus") -> str:
    """DuckDB oracle equivalent of triples_frame (same rows, same dedup)."""
    return f"""
SELECT repo, path, concat(repo, '/', path) AS subj, 'file' AS subj_type,
       'imports' AS pred,
       unnest(list_distinct(regexp_extract_all(content, 'import (mod[0-9]+)', 1))) AS obj,
       'module' AS obj_type
FROM {corpus_rel}
UNION ALL
SELECT repo, path, concat(repo, '/', path), 'file', 'defines',
       regexp_extract(content, 'def (fn[0-9]+)', 1), 'function'
FROM {corpus_rel}
UNION ALL
SELECT repo, path, regexp_extract(content, 'def (fn[0-9]+)', 1), 'function',
       'calls', concat(regexp_extract(content, 'return (mod[0-9]+)', 1), '.call'),
       'callable'
FROM {corpus_rel}
UNION ALL
SELECT repo, path, regexp_extract(content, 'class (Cls[0-9]+)', 1), 'class',
       'extends', regexp_extract(content, '[(](Base[0-9]+)[)]', 1), 'class'
FROM {corpus_rel}
""".strip()


def gold_offsets_sql(documents_rel: str = "documents") -> str:
    """Engine-portable SQL deriving triples WITH char offsets arithmetically
    from the content grammar — the offset-level gold fixture (north-star
    metric is P/R at string AND offset level; reference offset tuples:
    scorer.py:292-313). 0-based offsets, closed grammar:

      l1 'import mod<a>\\n'  len 11+la      mod_a at 7
      l2 'import mod<b>\\n'  len 11+lb      mod_b at 18+la
      l3 'def fn<d>(x):\\n'  len 11+ld      fn_d  at 26+la+lb
      l4 '    return mod<a>.call(x) + "<s>"\\n' len 28+la+ls
                                           mod_a at 44+la+lb+ld
      l5 'class Cls<d>(Base<b>):\\n'        Cls_d at 67+2*la+lb+ld+ls
                                           Base_b at 71+2*la+lb+2*ld+ls
    Duplicate import (a == b) keeps only the first occurrence, matching the
    extractor's per-doc dedup."""
    return f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(doc_id % 97 AS STRING) AS a,
         CAST((doc_id * 7 + 3) % 97 AS STRING) AS b,
         CAST(doc_id AS STRING) AS d,
         least(length(text), 48) AS ls
  FROM {documents_rel}
), m AS (
  SELECT doc_id, a, b, d, ls,
         length(a) AS la, length(b) AS lb, length(d) AS ld,
         concat('org/repo', CAST(doc_id % 20 AS STRING)) AS repo,
         concat('src/file_', d, '.py') AS path
  FROM t
)
SELECT repo, path, concat(repo, '/', path) AS subj, 'file' AS subj_type,
       'imports' AS pred, concat('mod', a) AS obj, 'module' AS obj_type,
       CAST(-1 AS INT) AS subj_start, CAST(7 AS INT) AS obj_start
FROM m
UNION ALL
SELECT repo, path, concat(repo, '/', path), 'file', 'imports',
       concat('mod', b), 'module', CAST(-1 AS INT), CAST(18 + la AS INT)
FROM m WHERE a <> b
UNION ALL
SELECT repo, path, concat(repo, '/', path), 'file', 'defines',
       concat('fn', d), 'function', CAST(-1 AS INT),
       CAST(26 + la + lb AS INT)
FROM m
UNION ALL
SELECT repo, path, concat('fn', d), 'function', 'calls',
       concat('mod', a, '.call'), 'callable', CAST(26 + la + lb AS INT),
       CAST(44 + la + lb + ld AS INT)
FROM m
UNION ALL
SELECT repo, path, concat('Cls', d), 'class', 'extends',
       concat('Base', b), 'class',
       CAST(67 + 2 * la + lb + ld + ls AS INT),
       CAST(71 + 2 * la + lb + 2 * ld + ls AS INT)
FROM m
""".strip()


# ---------------------------------------------------------------- gold fixture

def gold_offsets_closest_sql(documents_rel: str = "documents") -> str:
    """Arithmetic gold for triples_udf(offset_strategy='closest'): only the
    records whose BOTH surfaces occur in content survive (calls + extends —
    the file-id subject of imports/defines never occurs, so the closest
    strategy drops them, mirroring the reference's un-reconstructable-arg
    drop in record_to_offset_closest_role, sel2record.py:470-519). Every
    surviving surface occurs exactly once in the grammar, so the closest
    pair IS that occurrence pair — same positions as gold_offsets_sql:
      fn<d>        at 26+la+lb            (l3)
      mod<a>.call  at 44+la+lb+ld         (l4)
      Cls<d>       at 67+2*la+lb+ld+ls    (l5)
      Base<b>      at 71+2*la+lb+2*ld+ls  (l5)
    """
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(doc_id % 97 AS STRING) AS a,
         CAST((doc_id * 7 + 3) % 97 AS STRING) AS b,
         CAST(doc_id AS STRING) AS d,
         least(length(text), 48) AS ls
  FROM {documents_rel}
), m AS (
  SELECT a, b, d, ls,
         length(a) AS la, length(b) AS lb, length(d) AS ld,
         concat('org/repo', CAST(doc_id % 20 AS STRING)) AS repo,
         concat('src/file_', d, '.py') AS path
  FROM t
)
SELECT repo, path, concat('fn', d) AS subj, 'function' AS subj_type,
       'calls' AS pred, concat('mod', a, '.call') AS obj,
       'callable' AS obj_type,
       CAST(26 + la + lb AS INT) AS subj_start,
       CAST(44 + la + lb + ld AS INT) AS obj_start
FROM m
UNION ALL
SELECT repo, path, concat('Cls', d), 'class', 'extends',
       concat('Base', b), 'class',
       CAST(67 + 2 * la + lb + ld + ls AS INT),
       CAST(71 + 2 * la + lb + 2 * ld + ls AS INT)
FROM m
""".strip()


def gold_triples_sql(documents_rel: str = "documents") -> str:
    """Engine-portable SQL: the same triples derived arithmetically from
    doc_id — independent of the extraction path; serves as the gold fixture
    for P/R scoring (target P/R >= 0.95; this construction yields 1.0)."""
    base = f"""
(SELECT doc_id,
        concat('org/repo', CAST(doc_id % 20 AS STRING)) AS repo,
        concat('src/file_', CAST(doc_id AS STRING), '.py') AS path,
        CAST(doc_id % 97 AS STRING) AS a,
        CAST((doc_id * 7 + 3) % 97 AS STRING) AS b,
        CAST(doc_id AS STRING) AS d
 FROM {documents_rel}) t
""".strip()
    return f"""
SELECT DISTINCT * FROM (
  SELECT repo, path, concat(repo, '/', path) AS subj, 'file' AS subj_type,
         'imports' AS pred, concat('mod', a) AS obj, 'module' AS obj_type
  FROM {base}
  UNION ALL
  SELECT repo, path, concat(repo, '/', path), 'file', 'imports',
         concat('mod', b), 'module' FROM {base}
  UNION ALL
  SELECT repo, path, concat(repo, '/', path), 'file', 'defines',
         concat('fn', d), 'function' FROM {base}
  UNION ALL
  SELECT repo, path, concat('fn', d), 'function', 'calls',
         concat('mod', a, '.call'), 'callable' FROM {base}
  UNION ALL
  SELECT repo, path, concat('Cls', d), 'class', 'extends',
         concat('Base', b), 'class' FROM {base}
) g
""".strip()


def gold_events_sql(documents_rel: str = "documents") -> str:
    """Engine-portable SQL deriving event role records arithmetically from
    the content grammar — the event gold fixture (the UIE third record type;
    reference EventRecord: sel2record.py:522-612, EventScorer tuple shapes:
    scorer.py:438-516). First-match char offsets, same conventions as
    gold_offsets_sql: trigger 'mod<a>.call' first occurs in l4 at
    44+la+lb+ld; callee 'mod<a>' first occurs in l1 at 7; caller 'fn<d>'
    first occurs in l3 at 26+la+lb."""
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(doc_id % 97 AS STRING) AS a,
         CAST((doc_id * 7 + 3) % 97 AS STRING) AS b,
         CAST(doc_id AS STRING) AS d
  FROM {documents_rel}
), m AS (
  SELECT concat('org/repo', CAST(doc_id % 20 AS STRING)) AS repo,
         concat('src/file_', d, '.py') AS path,
         a, d, length(a) AS la, length(b) AS lb, length(d) AS ld
  FROM t
)
SELECT repo, path, 'invoke' AS event_type,
       concat('mod', a, '.call') AS trigger_text,
       CAST(44 + la + lb + ld AS INT) AS trigger_start,
       'callee' AS role, concat('mod', a) AS arg_text, CAST(7 AS INT) AS arg_start
FROM m
UNION ALL
SELECT repo, path, 'invoke', concat('mod', a, '.call'),
       CAST(44 + la + lb + ld AS INT),
       'caller', concat('fn', d), CAST(26 + la + lb AS INT)
FROM m
""".strip()


def gold_events_closest_sql(documents_rel: str = "documents") -> str:
    """Arithmetic gold for sel_roundtrip_events(offset_strategy='closest')
    (reference EventRecord.record_to_offset_closest_role,
    sel2record.py:609-662): the trigger 'mod<a>.call' keeps its first (only)
    occurrence at 44+la+lb+ld; the callee role 'mod<a>' has occurrences at 7
    (l1), possibly 18+la (prefix of mod<b> when str(a) prefixes str(b)), and
    44+la+lb+ld (prefix of the trigger itself, distance 0) — closest always
    picks the trigger-position occurrence, which is what separates this gold
    from gold_events_sql (first: callee at 7). The caller 'fn<d>' occurs
    once at 26+la+lb under either strategy."""
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(doc_id % 97 AS STRING) AS a,
         CAST((doc_id * 7 + 3) % 97 AS STRING) AS b,
         CAST(doc_id AS STRING) AS d
  FROM {documents_rel}
), m AS (
  SELECT concat('org/repo', CAST(doc_id % 20 AS STRING)) AS repo,
         concat('src/file_', d, '.py') AS path,
         a, d, length(a) AS la, length(b) AS lb, length(d) AS ld
  FROM t
)
SELECT repo, path, 'invoke' AS event_type,
       concat('mod', a, '.call') AS trigger_text,
       CAST(44 + la + lb + ld AS INT) AS trigger_start,
       'callee' AS role, concat('mod', a) AS arg_text,
       CAST(44 + la + lb + ld AS INT) AS arg_start
FROM m
UNION ALL
SELECT repo, path, 'invoke', concat('mod', a, '.call'),
       CAST(44 + la + lb + ld AS INT),
       'caller', concat('fn', d), CAST(26 + la + lb AS INT)
FROM m
""".strip()


def events_duck_sql(corpus_rel: str = "corpus") -> str:
    """DuckDB twin of sel.sel_roundtrip_events: regexp extraction + instr
    first-match offsets over the corpus content (the independent pred path
    used by the kg_score_events oracle)."""
    return f"""
WITH e AS (
  SELECT repo, path, content,
         regexp_extract(content, 'return (mod[0-9]+)[.]call', 1) AS callee,
         regexp_extract(content, 'def (fn[0-9]+)', 1) AS caller
  FROM {corpus_rel}
  WHERE regexp_matches(content, 'return mod[0-9]+[.]call')
    AND regexp_matches(content, 'def fn[0-9]+')
)
SELECT repo, path, 'invoke' AS event_type,
       concat(callee, '.call') AS trigger_text,
       CAST(instr(content, concat(callee, '.call')) - 1 AS INT) AS trigger_start,
       'callee' AS role, callee AS arg_text,
       CAST(instr(content, callee) - 1 AS INT) AS arg_start
FROM e
UNION ALL
SELECT repo, path, 'invoke', concat(callee, '.call'),
       CAST(instr(content, concat(callee, '.call')) - 1 AS INT),
       'caller', caller, CAST(instr(content, caller) - 1 AS INT)
FROM e
""".strip()
