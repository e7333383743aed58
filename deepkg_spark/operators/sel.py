"""SEL (structured extraction language) serializer + parser -> records.

Re-implements, from scratch, the semantics of the reference's UIE pipeline
stage that turns a generated bracketed expression into typed records
(citations into /root/reference/UIE_torch/uie/evaluation/):
- bracket tokens: <extra_id_0> opens a node, <extra_id_1> closes it,
  <extra_id_5> separates label from span text, <extra_id_6> is the null span
  (constants.py:21-73).
- serializer shape per spot: "<extra_id_0> TYPE <extra_id_5> SPAN
  [<extra_id_0> ROLE <extra_id_5> SPAN <extra_id_1>]* <extra_id_1>"
  (convert_spot_asoc, sel2record.py:995-1026).
- ill-formed repair: unbalanced expressions are fixed by appending missing
  closing brackets; unparseable input degrades to zero records
  (sel2record.py:888-973, 1097-1102).
- validation: spot/role labels outside the schema are dropped, spans that do
  not occur in the source text are dropped (rewrite_label_span semantics,
  sel2record.py:976-992), duplicate records are suppressed per doc
  (sel2record.py:463-466).

The parser is pure deterministic Python executed inside Arrow-batched
mapInPandas (never per-row Python UDFs); the round-trip
serialize(triples) -> parse -> records is oracle-checked against the plain
regexp extraction path, giving the SEL machinery an exact correctness gate.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TYPE_START = "<extra_id_0>"
TYPE_END = "<extra_id_1>"
SPAN_SPLIT = "<extra_id_5>"
NULL_SPAN = "<extra_id_6>"


@dataclass
class RecordSchema:
    """Extraction type system (sel2record.py:210-248 shape)."""

    type_list: list[str]
    role_list: list[str]
    type_role_dict: dict[str, list[str]]
    # role -> object entity type (engine addition: SEL carries no object type)
    role_object_type: dict[str, str] = field(default_factory=dict)
    # event types ride the same SEL tree; the schema decides whether a spot
    # maps to an entity or an event record (sel2record.py:41-96 dispatch on
    # schema_dict['entity'] vs schema_dict['event'] type lists)
    event_type_list: list[str] = field(default_factory=list)
    event_role_dict: dict[str, list[str]] = field(default_factory=dict)


CODE_SCHEMA = RecordSchema(
    type_list=["file", "function", "class"],
    role_list=["imports", "defines", "calls", "extends"],
    type_role_dict={
        "file": ["imports", "defines"],
        "function": ["calls"],
        "class": ["extends"],
    },
    role_object_type={
        "imports": "module",
        "defines": "function",
        "calls": "callable",
        "extends": "class",
    },
    event_type_list=["invoke"],
    event_role_dict={"invoke": ["callee", "caller"]},
)


# ---------------------------------------------------------------- serializer

def spot_asoc_to_sel(spots: list[tuple[str, str, list[tuple[str, str]]]]) -> str:
    """[(spot_type, spot_text, [(role, text), ...])] -> SEL string."""
    parts = []
    for stype, stext, asocs in spots:
        inner = "".join(
            f"{TYPE_START} {role} {SPAN_SPLIT} {text} {TYPE_END} "
            for role, text in asocs
        )
        parts.append(f"{TYPE_START} {stype} {SPAN_SPLIT} {stext} {inner}{TYPE_END} ")
    return "".join(parts).strip()


# ---------------------------------------------------------------- parser

def _repair_brackets(tokens: list[str]) -> list[str]:
    """Append missing closes / drop orphan closes (bracket-balancing repair)."""
    depth = 0
    out = []
    for t in tokens:
        if t == TYPE_START:
            depth += 1
        elif t == TYPE_END:
            if depth == 0:
                continue  # orphan close: drop
            depth -= 1
        out.append(t)
    out.extend([TYPE_END] * depth)
    return out


def parse_sel(sel: str) -> list[tuple[str, str, list[tuple[str, str]]]]:
    """SEL string -> [(spot_type, spot_text, [(role, text), ...])].

    Recursive-descent over bracket tokens; nodes deeper than 2 levels and
    nodes without a label/span split are dropped (degrade, never raise).
    """
    raw = sel.replace(TYPE_START, f" {TYPE_START} ").replace(
        TYPE_END, f" {TYPE_END} "
    ).replace(SPAN_SPLIT, f" {SPAN_SPLIT} ")
    tokens = _repair_brackets(raw.split())

    def parse_node(i: int) -> tuple[dict | None, int]:
        # tokens[i] == TYPE_START; collect label, span, children
        words: list[str] = []
        label: str | None = None
        children = []
        i += 1
        while i < len(tokens):
            t = tokens[i]
            if t == TYPE_START:
                child, i = parse_node(i)
                if child is not None:
                    children.append(child)
            elif t == TYPE_END:
                span = " ".join(words).strip()
                if label is None:  # no split marker: malformed node
                    return None, i + 1
                return {"label": label.strip(), "span": span, "children": children}, i + 1
            elif t == SPAN_SPLIT:
                label = " ".join(words)
                words = []
                i += 1
                continue
            else:
                words.append(t)
                i += 1
                continue
            # after child parse, loop continues without i increment here
        return None, i

    spots = []
    i = 0
    while i < len(tokens):
        if tokens[i] == TYPE_START:
            node, i = parse_node(i)
            if node is not None:
                asocs = [
                    (c["label"], c["span"])
                    for c in node["children"]
                    if c["span"] != NULL_SPAN
                ]
                spots.append((node["label"], node["span"], asocs))
        else:
            i += 1
    return spots


def sel_to_relations(
    sel: str, text: str, schema: RecordSchema
) -> list[tuple[str, str, str, str, str]]:
    """Parse + validate + dedup -> (subj, subj_type, pred, obj, obj_type).

    Validation per rewrite_label_span semantics: spot label must be a schema
    type, role must be legal for the spot type, and both spans must occur in
    the source text.
    """
    seen: set[tuple] = set()
    out = []
    for stype, stext, asocs in parse_sel(sel):
        stext = fix_unk_from_text(stext, text)
        if stype not in schema.type_list or stext not in text:
            continue
        for role, rtext in asocs:
            if role not in schema.type_role_dict.get(stype, []):
                continue
            rtext = fix_unk_from_text(rtext, text)
            if rtext not in text:
                continue
            rec = (stext, stype, role, rtext, schema.role_object_type.get(role, ""))
            if rec in seen:
                continue
            seen.add(rec)
            out.append(rec)
    return out


# ---------------------------------------------------------------- Spark ops

import re as _re

_IMPORT_RE = _re.compile(r"import (mod[0-9]+)")
_DEF_RE = _re.compile(r"def (fn[0-9]+)")
_RETURN_RE = _re.compile(r"return (mod[0-9]+)")
_CLASS_RE = _re.compile(r"class (Cls[0-9]+)\((Base[0-9]+)\)")


def doc_to_spot_asoc(repo: str, path: str, content: str) -> list:
    """Deterministic spot-asoc construction from the corpus grammar (plays
    the role of the seq2seq generator; ordered prompts -> reproducible,
    mirroring the eval-time ordered-SSI requirement,
    data_collator_torch.py:292-297)."""
    file_id = f"{repo}/{path}"
    file_asocs = [("imports", m.group(1)) for m in _IMPORT_RE.finditer(content)]
    dm = _DEF_RE.search(content)
    spots = []
    if dm:
        file_asocs.append(("defines", dm.group(1)))
    spots.append(("file", file_id, file_asocs))
    if dm:
        rm = _RETURN_RE.search(content)
        if rm:
            spots.append(("function", dm.group(1), [("calls", rm.group(1) + ".call")]))
            # event spot: the call site as a trigger+roles record (the UIE
            # third record type; sel2record.py:62-67 event branch)
            spots.append(
                (
                    "invoke",
                    rm.group(1) + ".call",
                    [("callee", rm.group(1)), ("caller", dm.group(1))],
                )
            )
    cm = _CLASS_RE.search(content)
    if cm:
        spots.append(("class", cm.group(1), [("extends", cm.group(2))]))
    return spots


def sel_roundtrip_triples(corpus: DataFrame, schema: RecordSchema = CODE_SCHEMA) -> DataFrame:
    """corpus -> SEL serialize -> parse -> validated relation records.

    One narrow Arrow stage; output matches triples_frame exactly except that
    'obj in text' validation requires the object surface to occur verbatim —
    true for imports/defines/extends; for calls the object is 'modN.call'
    which also occurs ('modN.call(x)'). The oracle is therefore the same
    regexp-derived triple set.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("repo", "path", "subj", "subj_type", "pred", "obj", "obj_type")}
            for repo, path, content in zip(pdf["repo"], pdf["path"], pdf["content"]):
                # file_id contains '/'-joined repo/path which is not in the
                # text; validate against text + file_id namespace
                sel = spot_asoc_to_sel(doc_to_spot_asoc(repo, path, content))
                ns = f"{repo}/{path}\n{content}"
                for subj, stype, pred, obj, otype in sel_to_relations(sel, ns, schema):
                    rows["repo"].append(repo)
                    rows["path"].append(path)
                    rows["subj"].append(subj)
                    rows["subj_type"].append(stype)
                    rows["pred"].append(pred)
                    rows["obj"].append(obj)
                    rows["obj_type"].append(otype)
            yield pd.DataFrame(rows)

    return corpus.select("repo", "path", "content").mapInPandas(
        run,
        schema="repo string, path string, subj string, subj_type string, "
        "pred string, obj string, obj_type string",
    )


# ---------------------------------------------------------------- unk repair

UNK = "<unk>"


def fix_unk_from_text(span: str, text: str, unk: str = UNK) -> str:
    """Repair ``<unk>`` placeholders in a generated span by bridging them
    back to the raw text — same semantics as the reference's tokenizer-free
    path (sel2record.py:766-793, fix_unk_from_text_without_tokenizer):

    - literal segments around each unk are regex-escaped,
    - every unk gap matches ``\\s*[^，？。\\s]+\\s*`` (one non-space,
      non-CJK-punctuation run, with surrounding whitespace),
    - a pattern longer than 100 chars falls back to the original span,
    - no match in the text falls back to the original span,
    - a match returns the stripped matched text.

    Example: span "<unk> colo e Bengo" over text ".. at Ícolo e Bengo"
    -> "Ícolo e Bengo".
    """
    if unk not in span:
        return span

    def esc(x: str) -> str:
        return _re.sub(r"([.*?()\[\]+])", r"\\\1", x)

    pattern = r"\s*[^，？。\s]+\s*".join(
        esc(part.strip()) for part in span.split(unk)
    )
    if len(pattern) > 100:
        return span
    m = _re.search(pattern, text)
    if not m:
        return span
    return m.group().strip()


# ---------------------------------------------------------------- events

def sel_to_events(
    sel: str, text: str, schema: RecordSchema, offset_strategy: str = "first"
) -> list[tuple[str, str, int, str, str, int]]:
    """Parse + validate + dedup -> event role records
    (event_type, trigger_text, trigger_start, role, arg_text, arg_start).

    Mirrors the reference's event mapping (sel2record.py:62-67: spots whose
    type is in the EVENT schema become {trigger, type, roles}) and its two
    event offset strategies:

    - 'first' (record_to_offset_first_role, sel2record.py:560-607): trigger
      and every role take the FIRST char occurrence of their span in the
      source text; a trigger that does not occur drops the whole record, a
      role that does not occur is dropped alone.
    - 'closest' (record_to_offset_closest_role, sel2record.py:609-662): the
      trigger still takes its first occurrence, but each role takes the
      occurrence CLOSEST to the trigger start (numpy.argmin over
      |role_start - trigger_start| — earliest occurrence wins ties, exactly
      argmin's first-minimum rule).

    The reference's cross-record trigger_matched_set (successive trigger
    occurrences for repeated triggers) is not needed for <=1 event per doc
    and is intentionally omitted."""
    from deepkg_spark.operators.offsets import char_occurrences

    if offset_strategy not in ("first", "closest"):
        raise ValueError(
            "event offset_strategy must be 'first' or 'closest' "
            f"(the reference's EventRecord strategies), got {offset_strategy!r}"
        )
    seen: set[tuple] = set()
    out = []
    for stype, stext, asocs in parse_sel(sel):
        if stype not in schema.event_type_list:
            continue
        stext = fix_unk_from_text(stext, text)
        t_start = text.find(stext)
        if t_start < 0:
            continue
        for role, rtext in asocs:
            if role not in schema.event_role_dict.get(stype, []):
                continue
            rtext = fix_unk_from_text(rtext, text)
            if offset_strategy == "closest":
                occ = char_occurrences(text, rtext)
                if not occ:
                    continue
                a_start = min(occ, key=lambda s: (abs(s - t_start), s))
            else:
                a_start = text.find(rtext)
                if a_start < 0:
                    continue
            rec = (stype, stext, t_start, role, rtext, a_start)
            if rec in seen:
                continue
            seen.add(rec)
            out.append(rec)
    return out


def sel_roundtrip_events(
    corpus: DataFrame, schema: RecordSchema = CODE_SCHEMA,
    offset_strategy: str = "first",
) -> DataFrame:
    """corpus -> SEL serialize -> parse -> validated event role records with
    char offsets under the selected strategy ('first' | 'closest' — the
    reference's EventRecord map_config options, see sel_to_events). One
    narrow Arrow stage (same shape as sel_roundtrip_triples); oracle = the
    arithmetic event gold (relations.gold_events_sql /
    gold_events_closest_sql)."""

    cols = (
        "repo", "path", "event_type", "trigger_text", "trigger_start",
        "role", "arg_text", "arg_start",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in cols}
            for repo, path, content in zip(pdf["repo"], pdf["path"], pdf["content"]):
                sel = spot_asoc_to_sel(doc_to_spot_asoc(repo, path, content))
                for etype, trig, ts, role, arg, as_ in sel_to_events(
                    sel, content, schema, offset_strategy
                ):
                    rows["repo"].append(repo)
                    rows["path"].append(path)
                    rows["event_type"].append(etype)
                    rows["trigger_text"].append(trig)
                    rows["trigger_start"].append(ts)
                    rows["role"].append(role)
                    rows["arg_text"].append(arg)
                    rows["arg_start"].append(as_)
            yield pd.DataFrame(rows)

    return corpus.select("repo", "path", "content").mapInPandas(
        run,
        schema="repo string, path string, event_type string, "
        "trigger_text string, trigger_start int, role string, "
        "arg_text string, arg_start int",
    )


# ---------------------------------------------------------- SSI prefixes

SPOT_PROMPT = "<spot>"
TEXT_START = "<extra_id_2>"


def ssi_prefix(docs: DataFrame, candidates: tuple[str, ...], k_neg: int = 2) -> DataFrame:
    """(doc_id, ssi): train-shape SSI prefix construction — the
    DynamicSSIGenerator semantics (data_collator_torch.py:94-243: positive
    spots + `k` sampled negative spots, spot-prompt tokens, text appended
    after `<extra_id_2>`; prompt tokens constants.py:21-26) with every
    random draw replaced by pinned hashing, so the TRAIN-time sampling
    shape exists in the engine without breaking the determinism contract
    (the reference itself pins eval to ordered prompts,
    utils_torch.py:149-152):

    - positives   = candidate types present in the doc's token list
      (positive_rate = 1: all kept);
    - negatives   = top `k_neg` absent candidates by h31(doc_id | type) —
      the rand-free analogue of sample_negative;
    - prompt order = ascending h31(doc_id | 'o' | type) — the rand-free
      analogue of the train-time shuffle (eval-ordered prompts remain the
      default everywhere else in the engine).

    Entirely JVM-side (explode over a literal candidate array, one window
    over the per-doc negatives, one groupBy) -> exact DuckDB oracle.
    """
    from deepkg_spark.functions.hashing import spark_h31
    from deepkg_spark.functions.text import spark_tokens, sql_quote
    from pyspark.sql import Window

    cand_arr = ", ".join(f"'{sql_quote(c)}'" for c in candidates)
    toks = spark_tokens("text")
    base = (
        docs.select("doc_id", "text", F.explode(F.expr(f"array({cand_arr})")).alias("t"))
        .withColumn("is_pos", F.expr(f"array_contains({toks}, t)"))
        .withColumn(
            "h", F.expr(spark_h31("concat(CAST(doc_id AS STRING), '|', t)"))
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.asc("h"), F.asc("t"))
    negs = (
        base.filter(~F.col("is_pos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k_neg)
        .select("doc_id", "t")
    )
    chosen = base.filter(F.col("is_pos")).select("doc_id", "t").unionByName(negs)
    okey = spark_h31("concat(CAST(doc_id AS STRING), '|o|', t)")
    keyed = chosen.select(
        "doc_id",
        F.expr(
            f"concat(lpad(CAST(pmod({okey}, 1000000) AS STRING), 7, '0'), ':', t)"
        ).alias("item"),
    )
    agg = keyed.groupBy("doc_id").agg(
        F.expr(
            f"concat_ws(' ', transform(sort_array(collect_list(item)), "
            f"x -> concat('{SPOT_PROMPT} ', substring(x, 9))))"
        ).alias("prefix")
    )
    return docs.join(agg, "doc_id", "left").select(
        "doc_id",
        F.concat(
            F.coalesce("prefix", F.lit("")), F.lit(f" {TEXT_START} "), F.col("text")
        ).alias("ssi"),
    )


def ssi_prefix_duck_sql(docs_rel: str, candidates: tuple[str, ...], k_neg: int = 2) -> str:
    from deepkg_spark.functions.hashing import duck_h31
    from deepkg_spark.functions.text import duck_tokens, sql_quote

    cand_arr = ", ".join(f"'{sql_quote(c)}'" for c in candidates)
    toks = duck_tokens("d.text")
    h = duck_h31("(CAST(d.doc_id AS VARCHAR) || '|' || c.t)")
    okey = duck_h31("(CAST(doc_id AS VARCHAR) || '|o|' || t)")
    return f"""
WITH base AS (
  SELECT d.doc_id, d.text, c.t,
         list_contains({toks}, c.t) AS is_pos,
         {h} AS h
  FROM {docs_rel} d CROSS JOIN (SELECT unnest([{cand_arr}]) AS t) c
),
negs AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, t,
           row_number() OVER (PARTITION BY doc_id ORDER BY h ASC, t ASC) AS rn
    FROM base WHERE NOT is_pos
  ) WHERE rn <= {k_neg}
),
chosen AS (
  SELECT doc_id, t FROM base WHERE is_pos
  UNION ALL SELECT doc_id, t FROM negs
),
keyed AS (
  SELECT doc_id,
         lpad(CAST(({okey}) % 1000000 AS VARCHAR), 7, '0') || ':' || t AS item
  FROM chosen
),
agg AS (
  SELECT doc_id,
         array_to_string(
           list_transform(list_sort(list(item)), x -> '{SPOT_PROMPT} ' || substr(x, 9)),
           ' ') AS prefix
  FROM keyed GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.prefix, '') || ' {TEXT_START} ' || d.text AS ssi
FROM {docs_rel} d LEFT JOIN agg a USING (doc_id)
""".strip()
