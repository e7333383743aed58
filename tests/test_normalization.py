"""Full-fidelity Unicode normalization (Q2B + NFD + Mn-strip + lower)."""

from deepkg_spark.functions.text import nfd_strip_lower, q2b
from deepkg_spark.operators.canonicalize import normalize_surfaces


def test_q2b_fullwidth():
    assert q2b("ＡＢＣ１２３") == "ABC123"
    assert q2b("　") == " "  # ideographic space -> ascii space
    assert q2b("plain") == "plain"


def test_nfd_strip_lower():
    assert nfd_strip_lower("Café") == "cafe"
    assert nfd_strip_lower("Ångström") == "angstrom"
    assert nfd_strip_lower("ABC") == "abc"


def test_normalize_surfaces_frame(spark):
    rows = [("Café",), ("ＡＢＣ",), ("Ångström",), ("mod7",)]
    df = spark.createDataFrame(rows, ["surface"])
    got = {r["surface"]: r["norm_full"] for r in normalize_surfaces(df).collect()}
    assert got == {
        "Café": "cafe",
        "ＡＢＣ": "abc",
        "Ångström": "angstrom",
        "mod7": "mod7",
    }
