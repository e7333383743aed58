"""Adversarial corpus: every text-family operator stays oracle-identical on
degenerate and unicode-heavy documents (empty text, lone separators, CJK,
combining marks, very long tokens, repeated whitespace).

The engines disagree first on edge cases — empty token lists, NULL-prone
aggregations, unicode length semantics — so the whole family is swept over
one nasty fixture instead of waiting for a real corpus to surface them.
"""

import duckdb
import pytest

from deepkg_spark.operators.curation import (
    pack_sequences,
    pack_sequences_duck_sql,
    repetition_stats,
    repetition_stats_duck_sql,
    unigram_logprob,
    unigram_logprob_duck_sql,
)
from deepkg_spark.operators.phrases import (
    neighbor_entropy,
    neighbor_entropy_duck_sql,
    ngram_stats,
    ngram_stats_duck_sql,
)
from deepkg_spark.operators.dedup import (
    dedup_exact,
    dedup_exact_duck_sql,
    jaccard_pairs,
    jaccard_pairs_duck_sql,
    minhash_lsh_pairs,
    minhash_lsh_pairs_duck_sql,
    minhash_signatures,
    minhash_signatures_duck_sql,
    simhash,
    simhash_duck_sql,
    simhash_pairs,
    simhash_pairs_duck_sql,
)
from deepkg_spark.operators.textstats import (
    fingerprints,
    fingerprints_duck_sql,
    lang_id,
    lang_id_duck_sql,
    quality_score,
    quality_score_duck_sql,
    token_counts,
    token_counts_duck_sql,
    wordpieces,
    wordpieces_duck_sql,
)
from tests.compare import compare_spark_duck

NASTY = [
    (0, ""),
    (1, " "),
    (2, "   "),
    (3, "a"),
    (4, "a b"),
    (5, "the the the the the"),
    (6, "x" * 500),
    (7, ("tok " * 200).strip()),
    (8, "naïve café résumé"),
    (9, "é combining mark"),
    (10, "的 是 了 在 和 的 是"),
    (11, "ＦＵＬＬｗｉｄｔｈ ｔｏｋｅｎｓ"),
    (12, "mixed 的 english 和 chinese the"),
    (13, "tab\tseparated stays one token"),
    (14, "trailing space "),
    (15, " leading space"),
    (16, "a  b   c    double  spaces"),
    (17, "SELECT * FROM t; -- sql-ish 'quotes' \"too\""),
    (18, "emoji 😀 in 😀 text 😀"),
    (19, "ÅNGSTRÖM ümlaut ß"),
]


@pytest.fixture(scope="module")
def nasty_con():
    import pandas as pd

    con = duckdb.connect()
    con.register("nasty", pd.DataFrame(NASTY, columns=["doc_id", "text"]))
    return con


@pytest.fixture(scope="module")
def nasty_docs(spark):
    return spark.createDataFrame(NASTY, "doc_id bigint, text string")


CASES = [
    (repetition_stats, repetition_stats_duck_sql, {}),
    (unigram_logprob, unigram_logprob_duck_sql, {"top_v": 5}),
    (pack_sequences, pack_sequences_duck_sql, {"budget": 8, "shard_size": 7}),
    (token_counts, token_counts_duck_sql, {}),
    (quality_score, quality_score_duck_sql, {}),
    (lang_id, lang_id_duck_sql, {}),
    (fingerprints, fingerprints_duck_sql, {}),
    (ngram_stats, ngram_stats_duck_sql, {}),
    (neighbor_entropy, neighbor_entropy_duck_sql, {}),
    (wordpieces, wordpieces_duck_sql, {}),
    (dedup_exact, dedup_exact_duck_sql, {}),
    (minhash_signatures, minhash_signatures_duck_sql, {}),
    (minhash_lsh_pairs, minhash_lsh_pairs_duck_sql, {"tau": 0.3}),
    (simhash, simhash_duck_sql, {}),
    # max_hamming bounded by the 60-bit/4-band recall guarantee (<= 3);
    # the loose 8 predates the r4 Manku banding widen and now trips the
    # operator's pigeonhole guard by design
    (simhash_pairs, simhash_pairs_duck_sql, {"max_hamming": 3}),
    (jaccard_pairs, jaccard_pairs_duck_sql, {"tau": 0.3}),
]


@pytest.mark.parametrize("op,oracle,kw", CASES, ids=[c[0].__name__ for c in CASES])
def test_nasty_parity(nasty_docs, nasty_con, op, oracle, kw):
    compare_spark_duck(op(nasty_docs, **kw), nasty_con, oracle("nasty", **kw))
