"""Curation operators (repetition / decontamination / sampling / packing /
unigram LM) and the STS Spearman eval vs DuckDB oracles."""

from pyspark.sql import functions as F

from deepkg_spark.operators.curation import (
    decontaminate,
    decontaminate_duck_sql,
    pack_sequences,
    pack_sequences_duck_sql,
    profile_table,
    profile_table_duck_sql,
    repetition_stats,
    repetition_stats_duck_sql,
    sample_stratified,
    sample_stratified_duck_sql,
    unigram_logprob,
    unigram_logprob_duck_sql,
)
from deepkg_spark.operators.similarity import sts_spearman, sts_spearman_duck_sql
from deepkg_spark.operators.textstats import lang_id, lang_id_duck_sql
from tests.compare import compare_spark_duck, duck_connect


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


def test_repetition_stats(spark, sf_dir):
    con = duck_connect(sf_dir)
    df = repetition_stats(_docs(spark, sf_dir))
    compare_spark_duck(df, con, repetition_stats_duck_sql("documents"))
    # a fully repeated doc maxes the signals
    one = spark.createDataFrame([(1, "x x x x x x"), (2, "a b c d e f")], "doc_id int, text string")
    rows = {r["doc_id"]: r for r in repetition_stats(one).collect()}
    assert rows[1]["top_tok_frac"] == 1.0 and rows[1]["dup_3gram_frac"] > 0.5
    assert rows[2]["dup_3gram_frac"] == 0.0


def test_repetition_empty_doc(spark):
    one = spark.createDataFrame([(1, ""), (2, "a")], "doc_id int, text string")
    rows = {r["doc_id"]: r for r in repetition_stats(one).collect()}
    assert rows[1]["n_tokens"] == 0 and rows[1]["top_tok_frac"] == 0.0
    assert rows[2]["n_tokens"] == 1 and rows[2]["top_2gram_frac"] == 0.0


def test_decontaminate(spark, sf_dir):
    con = duck_connect(sf_dir)
    docs = _docs(spark, sf_dir)
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    tr = docs.filter(F.col("doc_id") % 20 != 0).unionByName(
        ev.filter(F.col("doc_id") < 100).select(
            (F.col("doc_id") + 500000).alias("doc_id"), "text"
        )
    )
    df = decontaminate(tr, ev, n=5)
    sql = f"""
WITH eval_docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
train_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 20 <> 0
  UNION ALL
  SELECT doc_id + 500000 AS doc_id, text FROM documents
  WHERE doc_id % 20 = 0 AND doc_id < 100
), {decontaminate_duck_sql('train_docs', 'eval_docs', n=5)[5:]}
"""
    compare_spark_duck(df, con, sql)
    # every planted copy is contaminated (shares all its n-grams with eval)
    planted = df.filter(F.col("doc_id") >= 500000).collect()
    assert planted and all(r["contaminated"] for r in planted)
    assert all(r["n_hits"] == r["n_grams"] for r in planted)


def test_sample_stratified(spark, sf_dir):
    con = duck_connect(sf_dir)
    rates = {"en": 500, "de": 300}
    df = sample_stratified(
        lang_id(_docs(spark, sf_dir)), rates, default_permille=100,
        stratum_col="pred_lang",
    )
    compare_spark_duck(
        df,
        con,
        sample_stratified_duck_sql(
            f"({lang_id_duck_sql('documents')})", rates, default_permille=100,
            stratum_col="pred_lang",
        ),
    )
    # determinism across partitionings: same rows at any parallelism
    a = sorted(r["doc_id"] for r in df.collect())
    b = sorted(
        r["doc_id"]
        for r in sample_stratified(
            lang_id(_docs(spark, sf_dir).repartition(7)), rates,
            default_permille=100, stratum_col="pred_lang",
        ).collect()
    )
    assert a == b and len(a) > 0


def test_pack_sequences(spark, sf_dir):
    con = duck_connect(sf_dir)
    df = pack_sequences(_docs(spark, sf_dir), budget=128, shard_size=50)
    compare_spark_duck(
        df, con, pack_sequences_duck_sql("documents", budget=128, shard_size=50)
    )
    # bin invariant: every bin fits the budget unless it is a single oversized doc
    rows = df.collect()
    by_bin = {}
    for r in rows:
        by_bin.setdefault((r["shard"], r["bin"]), []).append(r["n_tokens"])
    for toks in by_bin.values():
        assert sum(toks) <= 128 or len(toks) == 1


def test_pack_sequences_oversized_doc(spark):
    docs = spark.createDataFrame(
        [(0, "a " * 200), (1, "b b"), (2, "c c")], "doc_id int, text string"
    )
    rows = {r["doc_id"]: r for r in pack_sequences(docs, budget=10, shard_size=100).collect()}
    assert rows[0]["bin"] == 0  # oversized first doc opens bin 0 alone
    assert rows[1]["bin"] == 1 and rows[2]["bin"] == 1


def test_unigram_logprob(spark, sf_dir):
    con = duck_connect(sf_dir)
    df = unigram_logprob(_docs(spark, sf_dir), top_v=20)
    compare_spark_duck(df, con, unigram_logprob_duck_sql("documents", top_v=20))
    # logprobs are negative; OOV never exceeds token count
    for r in df.collect():
        assert r["mean_log2p"] < 0 and 0 <= r["oov_tokens"] <= r["n_tokens"]


def test_profile_table(spark, sf_dir):
    con = duck_connect(sf_dir)
    num = ("l_orderkey", "l_quantity", "l_discount")
    st = ("l_returnflag",)
    ts = ("l_shipdate",)
    df = profile_table(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        num_cols=num, str_cols=st, ts_cols=ts,
    )
    compare_spark_duck(df, con, profile_table_duck_sql("lineitem", num, st, ts))
    rows = {r["col_name"]: r for r in df.collect()}
    assert rows["l_returnflag"]["kind"] == "str" and rows["l_returnflag"]["min_str"]
    assert rows["l_shipdate"]["kind"] == "num" and rows["l_shipdate"]["min_num"] > 0
    # null accounting: n_null + distinct-able values never exceed n_rows
    for r in rows.values():
        assert r["n_null"] + r["n_distinct"] <= r["n_rows"]


def test_profile_table_nulls(spark):
    docs = spark.createDataFrame(
        [(1, None, "a"), (2, 2.5, None), (3, 2.5, "b")],
        "id bigint, x double, s string",
    )
    rows = {r["col_name"]: r for r in profile_table(docs, ("id", "x"), ("s",)).collect()}
    assert rows["x"]["n_null"] == 1 and rows["x"]["n_distinct"] == 1
    assert rows["s"]["n_null"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["s"]["min_str"] == "a" and rows["s"]["max_str"] == "b"


def test_sts_spearman(spark, sf_dir):
    import __spark_entry__ as entrymod

    con = duck_connect(sf_dir)
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    df = sts_spearman(spark.sql(entrymod._sts_pairs_sql("spark")))
    compare_spark_duck(
        df, con, sts_spearman_duck_sql(f"({entrymod._sts_pairs_sql('duck')})")
    )
    row = df.collect()[0]
    assert row["n_pairs"] > 0 and -1.0 <= row["spearman"] <= 1.0


def test_pack_sequences_properties_hypothesis():
    """Next-fit invariants over generated corpora, via the DuckDB twin (the
    Spark==DuckDB equality is proven in test_pack_sequences; here the shared
    semantics are property-tested fast, no Spark round-trip per example)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60),
        st.integers(min_value=1, max_value=50),
    )
    def check(tok_lens, budget):
        con = duckdb.connect()
        con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
        for i, t in enumerate(tok_lens):
            con.execute("INSERT INTO d VALUES (?, ?)", [i, "x " * t])
        rows = con.sql(
            pack_sequences_duck_sql("d", budget=budget, shard_size=25)
            + " ORDER BY shard, doc_id"
        ).fetchall()
        assert len(rows) == len(tok_lens)  # every doc lands in exactly one bin
        by_bin, last = {}, {}
        for shard, doc_id, n_tokens, b in rows:
            # bins are nondecreasing in doc order and never skip numbers
            prev = last.get(shard, -1)
            assert b in (prev, prev + 1) if prev >= 0 else b == 0
            last[shard] = b
            by_bin.setdefault((shard, b), []).append(n_tokens)
        for toks in by_bin.values():
            assert sum(toks) <= budget or len(toks) == 1

    check()


def test_sample_stratified_nested(spark, sf_dir):
    """Raising a stratum's rate only ADDS rows (hash thresholding is nested)
    — the property that makes rate tuning reproducible on a live corpus."""
    base = lang_id(_docs(spark, sf_dir))
    small = {r["doc_id"] for r in sample_stratified(
        base, {"en": 200}, default_permille=100, stratum_col="pred_lang"
    ).collect()}
    big = {r["doc_id"] for r in sample_stratified(
        base, {"en": 600}, default_permille=300, stratum_col="pred_lang"
    ).collect()}
    assert small < big


def test_sts_spearman_zero_norm_filtered(spark):
    """ADVICE fix: zero-norm embeddings are dropped identically in both
    engines (Spark would NULL the cos, DuckDB would NaN it — and they sort
    on opposite ends)."""
    import duckdb

    rows = [
        (1, [1.0, 0.0], [1.0, 0.0], 0.9),
        (2, [0.0, 0.0], [1.0, 0.0], 0.5),  # zero-norm avec -> dropped
        (3, [1.0, 0.0], [0.0, 1.0], 0.1),
        (4, [0.5, 0.5], [0.5, 0.4], 0.7),
    ]
    pairs = spark.createDataFrame(
        rows, "pair_id int, avec array<double>, bvec array<double>, gold double"
    )
    df = sts_spearman(pairs)
    assert df.collect()[0]["n_pairs"] == 3
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pairs (pair_id INT, avec DOUBLE[], bvec DOUBLE[], gold DOUBLE)"
    )
    for r in rows:
        con.execute("INSERT INTO pairs VALUES (?, ?, ?, ?)", list(r))
    compare_spark_duck(df, con, sts_spearman_duck_sql("pairs"))


def test_sts_spearman_size_guard(spark, sf_dir):
    """The corpus-scale guard fires instead of funneling a huge sort
    through one task."""
    import pytest

    pairs = spark.createDataFrame(
        [(i, [1.0, 0.0], [1.0, 0.0], 0.5) for i in range(20)],
        "pair_id int, avec array<double>, bvec array<double>, gold double",
    )
    with pytest.raises(ValueError, match="eval-set operator"):
        sts_spearman(pairs, max_pairs=10)


def test_sample_stratified_quoted_stratum(spark):
    """ADVICE fix: stratum values containing single quotes survive the CASE
    interpolation in both engines."""
    import duckdb

    docs = spark.createDataFrame(
        [(1, "o'brien"), (2, "o'brien"), (3, "plain"), (4, "o'brien"), (5, "plain")]
        + [(i, "o'brien") for i in range(6, 40)],
        "doc_id int, stratum string",
    )
    rates = {"o'brien": 1000}
    df = sample_stratified(docs, rates, default_permille=0)
    got = sorted(r["doc_id"] for r in df.collect())
    # rate 1000 keeps every o'brien row, default 0 drops the rest
    assert got == sorted(
        r["doc_id"] for r in docs.filter(F.col("stratum") == "o'brien").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id INT, stratum VARCHAR)")
    for r in docs.collect():
        con.execute("INSERT INTO docs VALUES (?, ?)", [r["doc_id"], r["stratum"]])
    compare_spark_duck(df, con, sample_stratified_duck_sql("docs", rates, 0))


def test_profile_table_empty_cols_raises(spark):
    import pytest

    docs = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(ValueError, match="at least one"):
        profile_table(docs)
    with pytest.raises(ValueError, match="at least one"):
        profile_table_duck_sql("docs")


def test_pack_sequences_negative_ids(spark):
    """ADVICE fix: shard assignment is exact integral division on both
    sides — negative doc_ids truncate identically (Spark `div` == DuckDB
    `//`)."""
    import duckdb

    rows = [(i, "x " * abs(i % 7)) for i in range(-25, 25)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    df = pack_sequences(docs, budget=10, shard_size=10)
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    for r in rows:
        con.execute("INSERT INTO docs VALUES (?, ?)", list(r))
    compare_spark_duck(df, con, pack_sequences_duck_sql("docs", budget=10, shard_size=10))


def test_sts_spearman_perfect_and_inverse(spark):
    # gold == cos ranking -> 1.0; reversed gold -> -1.0
    pairs = spark.createDataFrame(
        [
            (1, [1.0, 0.0], [1.0, 0.0], 0.9),
            (2, [1.0, 0.0], [0.7, 0.7], 0.5),
            (3, [1.0, 0.0], [0.0, 1.0], 0.1),
        ],
        "pair_id int, avec array<double>, bvec array<double>, gold double",
    )
    assert sts_spearman(pairs).collect()[0]["spearman"] == 1.0
    inv = pairs.select("pair_id", "avec", "bvec", (1.0 - F.col("gold")).alias("gold"))
    assert sts_spearman(inv).collect()[0]["spearman"] == -1.0


def test_sts_spearman_ties_distributed(spark, sf_dir):
    """The corpus-scale Spearman (tied-average ranks from distinct-value
    cumulative counts): matches the DuckDB twin, equals the windowed
    variant when values are tie-free, and reproduces the classic tied
    estimator computed by hand."""
    import numpy as np

    import __spark_entry__ as entrymod
    from deepkg_spark.operators.similarity import (
        sts_spearman_ties,
        sts_spearman_ties_duck_sql,
    )

    con = duck_connect(sf_dir)
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    pairs = spark.sql(entrymod._sts_pairs_sql("spark"))
    df = sts_spearman_ties(pairs)
    compare_spark_duck(
        df, con, sts_spearman_ties_duck_sql(f"({entrymod._sts_pairs_sql('duck')})")
    )
    # tie-free fixture: ties estimator == windowed estimator
    clean = spark.createDataFrame(
        [
            (1, [1.0, 0.0], [1.0, 0.0], 0.9),
            (2, [1.0, 0.0], [0.7, 0.7], 0.5),
            (3, [1.0, 0.0], [0.0, 1.0], 0.1),
            (4, [0.5, 0.5], [0.5, 0.4], 0.7),
        ],
        "pair_id int, avec array<double>, bvec array<double>, gold double",
    )
    a = sts_spearman(clean).collect()[0]["spearman"]
    b = sts_spearman_ties(clean).collect()[0]["spearman"]
    assert a == b
    # tied fixture: equals the hand-computed average-rank Pearson
    tied_rows = [
        (1, [1.0, 0.0], [1.0, 0.0], 0.5),   # cos 1.0
        (2, [0.0, 1.0], [0.0, 1.0], 0.5),   # cos 1.0 (tie), gold tie
        (3, [1.0, 0.0], [0.0, 1.0], 0.1),   # cos 0.0
        (4, [1.0, 0.0], [0.7, 0.7], 0.9),
    ]
    tied = spark.createDataFrame(
        tied_rows, "pair_id int, avec array<double>, bvec array<double>, gold double"
    )
    got = sts_spearman_ties(tied).collect()[0]["spearman"]

    def avg_ranks(v):
        v = np.asarray(v)
        out = np.empty(len(v))
        for i, x in enumerate(v):
            out[i] = (v < x).sum() + ((v == x).sum() + 1) / 2.0
        return out

    cos = [1.0, 1.0, 0.0, np.dot([1, 0], [0.7, 0.7])]
    gold = [r[3] for r in tied_rows]
    expect = np.corrcoef(avg_ranks(cos), avg_ranks(gold))[0, 1]
    assert abs(got - round(expect, 6)) < 2e-6


def test_profile_quantiles(spark, sf_dir):
    """Cumulative-count quantiles vs the same-formulation DuckDB twin AND
    vs DuckDB's native quantile_cont (independent implementation)."""
    from deepkg_spark.operators.curation import (
        profile_quantiles,
        profile_quantiles_duck_sql,
    )
    from tests.compare import compare_spark_duck, duck_connect

    cols = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    con = duck_connect(sf_dir)
    compare_spark_duck(
        profile_quantiles(li, num_cols=cols),
        con,
        profile_quantiles_duck_sql("lineitem", num_cols=cols),
    )
    got = {r["col_name"]: r for r in profile_quantiles(li, num_cols=cols).collect()}
    for c in cols:
        native = con.execute(
            f"SELECT round(quantile_cont({c}, 0.25), 6), round(quantile_cont({c}, 0.5), 6), "
            f"round(quantile_cont({c}, 0.75), 6) FROM lineitem"
        ).fetchone()
        assert (got[c]["q_25"], got[c]["q_5"], got[c]["q_75"]) == native, c


def test_top_terms(spark, sf_dir):
    from deepkg_spark.operators.textstats import top_terms, top_terms_duck_sql
    from tests.compare import compare_spark_duck, duck_connect

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    con = duck_connect(sf_dir)
    compare_spark_duck(top_terms(docs, k=20), con, top_terms_duck_sql("documents", k=20))
    rows = top_terms(docs, k=20).collect()
    assert len(rows) == 20
    # ordering is total and deterministic; df <= tf always
    tfs = [(r["tf"], r["term"]) for r in rows]
    assert tfs == sorted(tfs, key=lambda t: (-t[0], t[1]))
    assert all(r["df"] <= r["tf"] for r in rows)
