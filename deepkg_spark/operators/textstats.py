"""Text analysis operators for training-data pipelines.

Four document-level analyses over documents(doc_id, text), each JVM-side with
a DuckDB oracle twin:

- ``lang_id``        — stopword-lexicon language scoring (n-gram-free
  heuristic; the lexicon is a broadcast inline table). Deterministic
  tie-break by language code.
- ``quality_score``  — length / punctuation-ratio / stopword-ratio /
  mean-token-length features composed into a [0,1] score (the
  quality-scoring shape used by corpus filters).
- ``token_counts``   — whitespace tokens + identifier-regex tokens + char
  count (BPE-ish proxy: ceil(chars/4)).
- ``fingerprints``   — winnowing document fingerprints: k-shingle hashes,
  sliding-window minimum (window w), distinct kept hashes. Standard
  MOSS-style winnowing expressed with a window min — no Python.

Reference analogues: stopword/low-freq filtering and char/word/2-gram cutters
(Normalization/recall/tools/text_preprocess.py:17-116), corpus charset filters
(AutoPhraseX-main/autophrasex/extractors.py:13-15, 76-88).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepkg_spark.functions.hashing import duck_h32, spark_h32
from deepkg_spark.functions.text import duck_ngrams, duck_tokens, spark_ngrams, spark_tokens

ROUND = 6

# tiny deterministic stopword lexicons (inline constants in both engines)
LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "de", "et", "que"),
    "de": ("der", "die", "das", "und", "zu"),
    "zh": ("的", "是", "了", "在", "和"),
}

STOPWORDS = LEXICONS["en"]


# ---------------------------------------------------------------- lang id

def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, lang_hits): argmax of lexicon hits, ties -> lang asc."""
    toks = docs.select("doc_id", F.expr(spark_tokens("text")).alias("toks"))
    scores = []
    for lang, words in sorted(LEXICONS.items()):
        arr = ", ".join(f"'{w}'" for w in words)
        scores.append(
            f"struct(CAST(-size(array_intersect(toks, array({arr}))) AS BIGINT) AS neg_hits, "
            f"'{lang}' AS lang)"
        )
    # array_min over (neg_hits, lang) structs = max hits with lang-asc tiebreak
    return toks.select(
        "doc_id",
        F.expr(f"array_min(array({', '.join(scores)}))").alias("best"),
    ).select(
        "doc_id",
        F.col("best.lang").alias("pred_lang"),
        (-F.col("best.neg_hits")).cast("bigint").alias("lang_hits"),
    )


def lang_id_duck_sql(docs_rel: str) -> str:
    structs = []
    for lang, words in sorted(LEXICONS.items()):
        arr = ", ".join(f"'{w}'" for w in words)
        structs.append(
            f"{{'neg_hits': -CAST(len(list_intersect(toks, [{arr}])) AS BIGINT), "
            f"'lang': '{lang}'}}"
        )
    return f"""
WITH t AS (SELECT doc_id, {duck_tokens('text')} AS toks FROM {docs_rel}),
b AS (SELECT doc_id, list_min([{', '.join(structs)}]) AS best FROM t)
SELECT doc_id, best.lang AS pred_lang, CAST(-best.neg_hits AS BIGINT) AS lang_hits FROM b
""".strip()


# ---------------------------------------------------------------- quality

def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_tokens, stop_ratio, mean_tok_len, quality).

    quality = 0.4 * min(n_tokens / 30, 1) + 0.3 * stop_ratio_term +
              0.3 * mean_len_term, each term in [0, 1]. Documented engine
    semantics (no reference formula exists); deterministic + portable.
    """
    arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    t = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.expr(spark_tokens("text")).alias("toks"),
    ).select(
        "doc_id",
        "n_chars",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.expr(f"size(filter(toks, x -> array_contains(array({arr}), x)))").alias("n_stop"),
        F.expr("aggregate(toks, CAST(0 AS BIGINT), (a, x) -> a + length(x))").alias("tok_chars"),
    )
    return t.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        F.round(F.col("n_stop") / F.greatest(F.col("n_tokens"), F.lit(1)), ROUND).alias("stop_ratio"),
        F.round(F.col("tok_chars") / F.greatest(F.col("n_tokens"), F.lit(1)), ROUND).alias("mean_tok_len"),
        F.round(
            0.4 * F.least(F.col("n_tokens") / 30.0, F.lit(1.0))
            + 0.3 * F.least(
                (F.col("n_stop") / F.greatest(F.col("n_tokens"), F.lit(1))) * 5.0,
                F.lit(1.0),
            )
            + 0.3 * F.least(
                (F.col("tok_chars") / F.greatest(F.col("n_tokens"), F.lit(1))) / 8.0,
                F.lit(1.0),
            ),
            ROUND,
        ).alias("quality"),
    )


def quality_score_duck_sql(docs_rel: str) -> str:
    arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         {duck_tokens('text')} AS toks
  FROM {docs_rel}
), s AS (
  SELECT doc_id, n_chars,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(toks, x -> list_contains([{arr}], x))) AS BIGINT) AS n_stop,
         -- list_sum([]) is NULL in DuckDB (and least() would then SKIP the
         -- null term); Spark's aggregate() folds to 0 — pin the engine
         -- semantics on zero-token docs
         CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS tok_chars
  FROM t
)
SELECT doc_id, n_chars, n_tokens,
       round(CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1), {ROUND}) AS stop_ratio,
       round(CAST(tok_chars AS DOUBLE) / greatest(n_tokens, 1), {ROUND}) AS mean_tok_len,
       round(0.4 * least(n_tokens / 30.0, 1.0)
           + 0.3 * least((CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1)) * 5.0, 1.0)
           + 0.3 * least((CAST(tok_chars AS DOUBLE) / greatest(n_tokens, 1)) / 8.0, 1.0),
           {ROUND}) AS quality
FROM s
""".strip()


# ---------------------------------------------------------------- token counts

def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, ident_tokens, n_chars, approx_bpe)."""
    return docs.select(
        "doc_id",
        F.expr(f"size({spark_tokens('text')})").cast("bigint").alias("ws_tokens"),
        F.expr("size(regexp_extract_all(text, '[A-Za-z_][A-Za-z0-9_]*', 0))")
        .cast("bigint")
        .alias("ident_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("approx_bpe"),
    )


def token_counts_duck_sql(docs_rel: str) -> str:
    return f"""
SELECT doc_id,
       CAST(len({duck_tokens('text')}) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z_][A-Za-z0-9_]*', 0)) AS BIGINT) AS ident_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_bpe
FROM {docs_rel}
""".strip()


# ---------------------------------------------------------------- fingerprints

def fingerprints(docs: DataFrame, k: int = 3, w: int = 4) -> DataFrame:
    """(doc_id, fp): winnowing fingerprints — min shingle-hash per sliding
    window of w consecutive k-shingles, deduplicated. A pair of documents
    sharing content longer than k+w-1 tokens shares at least one fingerprint.

    Computed entirely per document as array expressions (hash each shingle,
    array_min over each length-w slice, array_distinct, one explode) — the
    sliding window and the dedup are both doc-local, so the former
    explode -> per-doc window -> global DISTINCT plan (two exchanges of
    every (doc_id, pos, hash) row) collapses to a ZERO-shuffle narrow map.
    Identical row set: slice() truncates at the array end exactly like the
    window frame's `CURRENT ROW AND w-1 FOLLOWING`, and DISTINCT(doc_id, fp)
    == per-doc array_distinct because doc_id is part of the key."""
    toks = spark_tokens("text")
    # bind the hash array to a column FIRST: inlining it into the sliding
    # lambda would re-evaluate the md5 transform per window position
    t = docs.select(
        "doc_id",
        F.expr(f"transform({spark_ngrams(toks, k)}, s -> {spark_h32('s')})").alias("hs"),
    )
    fps = (
        f"CASE WHEN size(hs) >= 1 THEN "
        f"array_distinct(transform(sequence(1, size(hs)), "
        f"i -> array_min(slice(hs, i, {w})))) "
        f"ELSE array() END"
    )
    return t.select("doc_id", F.explode(F.expr(fps)).alias("fp"))


def fingerprints_duck_sql(docs_rel: str, k: int = 3, w: int = 4) -> str:
    toks = duck_tokens("text")
    return f"""
WITH sh AS (
  SELECT doc_id,
         unnest(CASE WHEN len({toks}) >= {k} THEN range(len({toks}) - {k} + 1) ELSE [] END) AS pos,
         unnest({duck_ngrams(toks, k)}) AS s
  FROM {docs_rel}
), h AS (SELECT doc_id, pos, {duck_h32('s')} AS h FROM sh)
SELECT DISTINCT doc_id,
       min(h) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fp
FROM h
""".strip()


def wordpieces(docs: DataFrame, head: int = 3) -> DataFrame:
    """(doc_id, token, pieces array<string>, merged string): wordpiece-style
    '##'-split and re-merge — the reference's subword handling seam
    (BERT tokenizers split OOV tokens into head + '##'-prefixed
    continuations; merging strips the '##' marker). Deterministic rule here:
    tokens longer than `head` chars split into (head, '##' + rest); merging
    concatenates pieces and drops '##'. merged == token is the roundtrip
    invariant the oracle checks."""
    toks = docs.select(
        "doc_id", F.explode(F.expr(spark_tokens("text"))).alias("token")
    )
    return toks.selectExpr(
        "doc_id",
        "token",
        f"IF(length(token) > {head}, "
        f"array(substring(token, 1, {head}), concat('##', substring(token, {head} + 1))), "
        f"array(token)) AS pieces",
    ).selectExpr(
        "doc_id",
        "token",
        # array columns are not driver-canonicalizable; emit the joined form
        "concat_ws(' ', pieces) AS pieces_joined",
        "replace(concat_ws('', pieces), '##', '') AS merged",
    )


def wordpieces_duck_sql(docs_rel: str, head: int = 3) -> str:
    toks = duck_tokens("text")
    return f"""
WITH t AS (SELECT doc_id, unnest({toks}) AS token FROM {docs_rel}),
p AS (
  SELECT doc_id, token,
         CASE WHEN length(token) > {head}
              THEN [substr(token, 1, {head}), '##' || substr(token, {head} + 1)]
              ELSE [token] END AS pieces
  FROM t
)
SELECT doc_id, token,
       array_to_string(pieces, ' ') AS pieces_joined,
       replace(array_to_string(pieces, ''), '##', '') AS merged
FROM p
""".strip()


# ---------------------------------------------------------------- top terms

def top_terms(docs: DataFrame, k: int = 100) -> DataFrame:
    """(term, tf, df): the k corpus-wide heaviest terms by total occurrence
    count (tf), with document frequency (df), deterministic tie-break
    (tf DESC, term ASC).

    The heavy-hitters query every corpus audit starts with. Plan shape is
    the point: orderBy(...).limit(k) compiles to TakeOrderedAndProject —
    every partition keeps only its local top-k and the driver merges k
    rows per partition, so no global sort ever materializes; tf/df come
    from one partial-aggregable groupBy over (term [,doc]) pairs. At
    100 TB the same plan holds (the only driver-side data is k rows);
    if even the term-key groupBy skews on a mega-stopword, the key is
    (term) with counts — one row per term, no row list.
    """
    occ = docs.select(
        "doc_id", F.explode(F.expr(spark_tokens("text"))).alias("term")
    )
    # one tokenize pass and two stacked aggregations: tf == sum of per-doc
    # counts, df == number of (term, doc) groups — identical to the former
    # separate tf / distinct-df branches, without the second explode of the
    # corpus or the tf-df join (explode once, 3 exchanges + join -> 2
    # exchanges, no join)
    per_doc = occ.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_doc.groupBy("term")
        .agg(
            F.sum("c").cast("bigint").alias("tf"),
            F.count(F.lit(1)).cast("bigint").alias("df"),
        )
        .orderBy(F.col("tf").desc(), F.col("term").asc())
        .limit(k)
    )


def top_terms_duck_sql(docs_rel: str, k: int = 100) -> str:
    return f"""
WITH occ AS (
  SELECT doc_id, unnest({duck_tokens('text')}) AS term FROM {docs_rel}
),
tf AS (SELECT term, CAST(count(*) AS BIGINT) AS tf FROM occ GROUP BY term),
df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT term, doc_id FROM occ) GROUP BY term
)
SELECT term, tf, df FROM tf JOIN df USING (term)
ORDER BY tf DESC, term ASC LIMIT {k}
"""
