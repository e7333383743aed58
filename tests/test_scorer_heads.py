"""Neural-shaped scorer heads: Biaffine + UnlabeledEntity share the
GlobalPointer decode path; deterministic, correct tensor shapes."""

import numpy as np

from deepkg_spark.operators.mentions import (
    BiaffineSpanScorer,
    UnlabeledEntityScorer,
    decode_global_pointer,
)

TEXT = "import mod7\ndef fn1(x):\n"


def test_biaffine_cube_shape_and_determinism():
    s1, s2 = BiaffineSpanScorer(), BiaffineSpanScorer()
    c1, c2 = s1.score_cube(TEXT), s2.score_cube(TEXT)
    assert c1.shape == (3, len(TEXT) + 2, len(TEXT) + 2)
    assert np.array_equal(c1, c2)


def test_unlabeled_cube_shape_and_determinism():
    s1, s2 = UnlabeledEntityScorer(), UnlabeledEntityScorer()
    c1, c2 = s1.score_cube(TEXT), s2.score_cube(TEXT)
    assert c1.shape == (3, len(TEXT) + 2, len(TEXT) + 2)
    assert np.array_equal(c1, c2)


FULL = (
    'import mod1\nimport mod10\ndef fn1(x):\n'
    '    return mod1.call(x) + "abcdef"\nclass Cls1(Base10):\n    pass\n'
)


def test_sparse_decode_equals_dense_per_head():
    """The production sparse decode (per-class GEMM / linear decomposition /
    rank-1 bias add) emits exactly the spans of the dense cube +
    decode_global_pointer path, at the contract thresholds, with matching
    scores — for all four neural-shaped heads."""
    from deepkg_spark.operators.mentions import (
        HEAD_THRESHOLDS,
        EfficientGlobalPointerScorer,
        RotaryGlobalPointerScorer,
    )

    for scorer, thr in (
        (BiaffineSpanScorer(), HEAD_THRESHOLDS["biaffine"]),
        (UnlabeledEntityScorer(), HEAD_THRESHOLDS["unlabeled"]),
        (RotaryGlobalPointerScorer(), HEAD_THRESHOLDS["rotary_gp"]),
        (EfficientGlobalPointerScorer(), HEAD_THRESHOLDS["efficient_gp"]),
    ):
        cube = scorer.score_cube(FULL)
        dense = {(c, i - 1, j - 1) for c, i, j in decode_global_pointer(cube, thr)}
        sp = scorer.score_spans(FULL, thr)
        sparse = {(c, s, e) for c, s, e, _ in sp}
        assert sparse == dense and sparse
        for c, s, e, v in sp:
            assert abs(cube[c, s + 1, e + 1] - v) < 1e-9


def test_rope_relative_position_property():
    """RoPE's defining property: for position-constant inputs the rotated
    dot product q_i . k_j depends only on the offset j - i."""
    from deepkg_spark.operators.mentions import _rope

    rng = np.random.RandomState(3)
    q0, k0 = rng.standard_normal(8), rng.standard_normal(8)
    n = 20
    s = _rope(np.tile(q0, (n, 1))) @ _rope(np.tile(k0, (n, 1))).T
    for d in (1, 3, 7):
        diag = [s[i, i + d] for i in range(n - d)]
        assert np.allclose(diag, diag[0])
    # and it is NOT position-independent overall (different offsets differ)
    assert abs(s[0, 1] - s[0, 3]) > 1e-6


def test_head_spans_udf_contract(spark, sf_dir):
    """ner_biaffine / ner_unlabeled contract rows: non-empty, deterministic
    across partitionings, schema stable."""
    from deepkg_spark.operators.mentions import head_spans_udf
    from deepkg_spark.sources.corpus import load_corpus

    corpus = load_corpus(spark, sf_dir)
    for head in ("biaffine", "unlabeled", "rotary_gp", "efficient_gp"):
        df = head_spans_udf(corpus, head=head)
        rows = sorted(tuple(r) for r in df.collect())
        assert len(rows) > 0
        again = sorted(
            tuple(r) for r in head_spans_udf(corpus.repartition(7), head=head).collect()
        )
        assert rows == again
        assert df.columns == ["repo", "path", "cls", "start_idx", "end_idx", "score"]


def test_heads_handle_non_ascii_text():
    """Per-code-point encoding: non-ASCII text (multi-byte UTF-8) must not
    raise a shape error, the cube must be sized by len(text), sparse ==
    dense still holds, and ASCII text keeps the original byte-indexed
    features (regression for the byte/char conflation in _HashFeatures)."""
    from deepkg_spark.operators.mentions import (
        EfficientGlobalPointerScorer,
        RotaryGlobalPointerScorer,
        _HashFeatures,
    )

    nat = 'Ícolo é Bengo：导入 modü7 naïve "quote"'
    for scorer in (
        BiaffineSpanScorer(),
        UnlabeledEntityScorer(),
        RotaryGlobalPointerScorer(),
        EfficientGlobalPointerScorer(),
    ):
        cube = scorer.score_cube(nat)
        assert cube.shape[1] == len(nat) + 2
        dense = {(c, i - 1, j - 1) for c, i, j in decode_global_pointer(cube, 0.5)}
        sparse = {(c, s, e) for c, s, e, _ in scorer.score_spans(nat, 0.5)}
        assert sparse == dense
    # ASCII backward-compat: one row per char, same vectors as utf-8 bytes
    feats = _HashFeatures()
    ascii_text = "import mod7"
    enc = feats.encode(ascii_text)
    assert enc.shape == (len(ascii_text), feats.dim)
    byte_idx = np.frombuffer(ascii_text.encode(), dtype=np.uint8)
    assert np.array_equal(enc, feats.table[byte_idx])


def test_heads_share_decode_semantics():
    """decode_global_pointer applies boundary mask + upper triangle + the
    threshold uniformly across heads."""
    for scorer in (BiaffineSpanScorer(), UnlabeledEntityScorer()):
        cube = scorer.score_cube(TEXT)
        spans = decode_global_pointer(cube, threshold=0.0)
        # decode invariants: in-bounds after unpad, start <= end, above 0
        for c, i, j in spans:
            assert 0 <= c < 3 and 1 <= i <= j <= len(TEXT)
            assert cube[c, i, j] > 0.0
        # threshold monotonicity: raising it only removes spans
        hi = set(decode_global_pointer(cube, threshold=1.0))
        assert hi.issubset(set(spans))
