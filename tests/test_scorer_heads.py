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
