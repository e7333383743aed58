"""Factored, oracle-certifiable decodes of the neural-shaped scorer heads.

The four pinned-seed heads in mentions.py (Biaffine / UnlabeledEntity /
RoPE GlobalPointer / Efficient-GP — reference semantics
ExtractionEntities/model/model.py:89-147, :193-235, :148-180 and the
published Efficient-GP row, UIE_torch/Readme.md:12) consume per-character
hash features, so every per-position quantity factors through the
character CODE (and, for the RoPE heads, the POSITION). This module
precomputes those factors ONCE on the driver with numpy:

    biaffine:      score[c,i,j] = sum_d HS[code_i,d] * UE[c,code_j,d]
    unlabeled:     score[c,i,j] = A[c,code_i] + B[c,code_j]
                                  + sum_d HW4[c,code_i,d] * H[code_j,d]
    rotary_gp:     q_d = Q0[c,code_i,d]*COS[i,d] + Q0R[c,code_i,d]*SIN[i,d]
                   k_d = K0[c,code_j,d]*COS[j,d] + K0R[c,code_j,d]*SIN[j,d]
                   score = (sum_d q_d*k_d) / sqrt(hs)
    efficient_gp:  shared (Q0..K0R no class dim) + per-class rank-1 bias:
                   score = (sum_d q_d*k_d)/sqrt(hs)
                           + (BIAS[code_i,c] + BIAS[code_j,c]) / 2

and evaluates the REMAINING arithmetic with the same IEEE-754 double
operations in the same left-associated order in BOTH engines:

- Spark (``head_spans_factored``): Arrow mapInPandas, one narrow stage; the
  per-dim accumulation is an explicit d-ascending loop of vectorized
  elementwise mul/add (numpy elementwise ufuncs are plain IEEE ops — no
  FMA, no reassociation), never a GEMM (BLAS reassociates sums).
- DuckDB (``head_spans_duck_sql``): the factor tables embedded as VALUES
  literals (repr() round-trips doubles exactly) and the score written as an
  explicit left-associated product sum.

Identical doubles in, identical ops in identical order -> bitwise-identical
scores, so the ``score > threshold`` span sets and emitted score columns
match EXACTLY between engines — this is what turns the four heads from
rows-only checks into driver-certifiable oracle queries. The original
numpy heads in mentions.py remain the reference implementations; unit
tests assert the factored decode reproduces their span sets (the two paths
differ only by float reassociation ~1e-13 relative, far from the decode
thresholds).

Scale shape: same as head_spans_udf — scan -> mapInPandas -> explode, no
shuffle; the O(n^2) span-pair scoring is intrinsic to the decode (the
reference scores the full [C, L, L] cube per sentence; n is bounded by the
corpus' sentence/window length exactly as the reference bounds maxlen).

Oracle-portability bounds (documented, asserted where cheap): character
codes are clamped to min(ord, 255) like mentions._HashFeatures.encode, and
the embedded SQL tables carry codes 0..127 and positions 0..255 — the
contract corpus is pure ASCII with content length <= ~180 by construction
(sources/corpus.py grammar). The Spark path carries full 256-code tables
and raises if a document exceeds MAX_POS.
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from deepkg_spark.operators.mentions import (
    HEAD_THRESHOLDS,
    BiaffineSpanScorer,
    EfficientGlobalPointerScorer,
    RotaryGlobalPointerScorer,
    UnlabeledEntityScorer,
)

MAX_POS = 256       # positions covered by the RoPE cos/sin tables
SQL_CODES = 128     # codes embedded in the oracle tables (ASCII corpus)

HEAD_SCHEMA = (
    "repo string, path string, cls int, start_idx int, end_idx int, score double"
)


def _rot_pairs(x: np.ndarray) -> np.ndarray:
    """Interleaved rotation used by _rope: out[2t] = -x[2t+1], out[2t+1] = x[2t]."""
    out = np.empty_like(x)
    out[..., 0::2] = -x[..., 1::2]
    out[..., 1::2] = x[..., 0::2]
    return out


def _trig_tables(head_size: int, max_pos: int = MAX_POS) -> tuple[np.ndarray, np.ndarray]:
    """COS/SIN [max_pos, head_size]: cos/sin(pos * inv_{d//2}), each angle
    repeated for the interleaved pair — mentions._rope's factors."""
    inv = np.power(10000.0, -2.0 * np.arange(head_size // 2) / head_size)
    ang = np.arange(max_pos)[:, None] * inv[None, :]
    return np.repeat(np.cos(ang), 2, axis=1), np.repeat(np.sin(ang), 2, axis=1)


@lru_cache(maxsize=None)
def build_head_tables(head: str) -> dict:
    """Per-code factor tables for one head, keyed as in the module docstring.

    All arrays are float64 and derived from the SAME pinned-seed weights the
    mentions.py scorers hold — the factorization changes association order
    (it precomputes tanh/projection per code instead of per text), which is
    exactly why the factored scores are the canonical contract values and
    the original heads are the approximate-parity reference.
    """
    if head == "biaffine":
        sc = BiaffineSpanScorer()
        t = sc.feats.table                       # [256, dim]
        hs = np.tanh(t @ sc.w_s)                 # [256, dim]
        he = np.tanh(t @ sc.w_e)                 # [256, dim]
        ue = np.stack([he @ sc.u[c].T for c in range(sc.n_classes)])  # [C,256,dim]
        return {"kind": "bilinear", "HS": hs, "UE": ue, "C": sc.n_classes,
                "D": hs.shape[1], "thr": HEAD_THRESHOLDS["biaffine"]}
    if head == "unlabeled":
        sc = UnlabeledEntityScorer()
        h = sc.feats.table                       # [256, dim]
        d = h.shape[1]
        a = np.stack([h @ (sc.w[c, 0:d] + sc.w[c, 2 * d:3 * d]) for c in range(sc.n_classes)])
        b = np.stack([h @ (sc.w[c, d:2 * d] - sc.w[c, 2 * d:3 * d]) for c in range(sc.n_classes)])
        hw4 = np.stack([h * sc.w[c, 3 * d:4 * d] for c in range(sc.n_classes)])
        return {"kind": "affine_bilinear", "A": a, "B": b, "HW4": hw4, "H": h,
                "C": sc.n_classes, "D": d, "thr": HEAD_THRESHOLDS["unlabeled"]}
    if head == "rotary_gp":
        sc = RotaryGlobalPointerScorer()
        t = sc.feats.table
        hs_ = sc.head_size
        per = (t @ sc.w).reshape(256, sc.n_classes, 2 * hs_)
        q0 = np.stack([per[:, c, :hs_] for c in range(sc.n_classes)])   # [C,256,hs]
        k0 = np.stack([per[:, c, hs_:] for c in range(sc.n_classes)])
        cos, sin = _trig_tables(hs_)
        return {"kind": "rope", "Q0": q0, "Q0R": _rot_pairs(q0), "K0": k0,
                "K0R": _rot_pairs(k0), "COS": cos, "SIN": sin,
                "C": sc.n_classes, "HS": hs_,
                "NORM": float(np.sqrt(hs_)), "BIAS": None,
                "thr": HEAD_THRESHOLDS["rotary_gp"]}
    if head == "efficient_gp":
        sc = EfficientGlobalPointerScorer()
        t = sc.feats.table
        hs_ = sc.head_size
        qk = t @ sc.w                            # [256, 2*hs]
        q0 = qk[:, :hs_][None]                   # shared across classes
        k0 = qk[:, hs_:][None]
        cos, sin = _trig_tables(hs_)
        return {"kind": "rope", "Q0": q0, "Q0R": _rot_pairs(q0), "K0": k0,
                "K0R": _rot_pairs(k0), "COS": cos, "SIN": sin,
                "C": sc.n_classes, "HS": hs_,
                "NORM": float(np.sqrt(hs_)), "BIAS": qk @ sc.wc,  # [256, C]
                "thr": HEAD_THRESHOLDS["efficient_gp"]}
    raise ValueError(f"unknown head {head!r}")


def _codes(text: str) -> np.ndarray:
    return np.fromiter(
        (min(ord(ch), 255) for ch in text), dtype=np.int64, count=len(text)
    )


def _score_doc(t: dict, codes: np.ndarray) -> list[tuple[int, int, int, float]]:
    """All (cls, start, end_inclusive, score) with score > threshold, upper
    triangle, via per-dim left-associated accumulation (see module doc)."""
    n = len(codes)
    if n == 0:
        return []
    thr = t["thr"]
    out = []
    if t["kind"] == "bilinear":
        hs = t["HS"][codes]                      # [n, D]
        for c in range(t["C"]):
            ue = t["UE"][c][codes]               # [n, D]
            m = np.multiply.outer(hs[:, 0], ue[:, 0])
            for d in range(1, t["D"]):
                m = m + np.multiply.outer(hs[:, d], ue[:, d])
            out.extend(_emit(c, m, thr))
        return out
    if t["kind"] == "affine_bilinear":
        h = t["H"][codes]
        for c in range(t["C"]):
            m = np.add.outer(t["A"][c][codes], t["B"][c][codes])
            hw = t["HW4"][c][codes]
            for d in range(t["D"]):
                m = m + np.multiply.outer(hw[:, d], h[:, d])
            out.extend(_emit(c, m, thr))
        return out
    # rope
    if n > MAX_POS:
        raise ValueError(
            f"document length {n} exceeds the {MAX_POS}-position RoPE factor "
            f"tables shared with the oracle — raise MAX_POS in lockstep"
        )
    cos, sin = t["COS"][:n], t["SIN"][:n]
    norm = t["NORM"]
    bias = t["BIAS"]
    nq = t["Q0"].shape[0]                        # 1 if shared projection
    for c in range(t["C"]):
        ci = min(c, nq - 1)
        q = t["Q0"][ci][codes] * cos + t["Q0R"][ci][codes] * sin   # [n, hs]
        k = t["K0"][ci][codes] * cos + t["K0R"][ci][codes] * sin
        m = np.multiply.outer(q[:, 0], k[:, 0])
        for d in range(1, t["HS"]):
            m = m + np.multiply.outer(q[:, d], k[:, d])
        m = m / norm
        if bias is not None:
            m = m + (np.add.outer(bias[codes, c], bias[codes, c]) / 2.0)
        out.extend(_emit(c, m, thr))
    return out


def _emit(c: int, m: np.ndarray, thr: float) -> list[tuple[int, int, int, float]]:
    ii, jj = np.where(np.triu(m) > thr)
    return [(c, int(i), int(j), float(m[i, j])) for i, j in zip(ii, jj) if i <= j]


def head_spans_factored(corpus: DataFrame, head: str) -> DataFrame:
    """Decoded spans of one scorer head — the oracle-certified contract
    surface (replaces the rows-only head_spans_udf queries). Same schema
    and decode semantics; scores are the factored-table values, emitted RAW
    (no rounding needed: each score is a pure per-row function of the
    content, so rows are bit-stable across cluster sizes by construction).
    One narrow stage: scan -> mapInPandas -> rows.
    """
    tables = build_head_tables(head)
    spark = corpus.sparkSession
    b = spark.sparkContext.broadcast(tables)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = b.value
        for pdf in batches:
            rows: dict[str, list] = {
                k: [] for k in ("repo", "path", "cls", "start_idx", "end_idx", "score")
            }
            for repo, path, content in zip(pdf["repo"], pdf["path"], pdf["content"]):
                for c, s, e, score in _score_doc(t, _codes(str(content))):
                    rows["repo"].append(repo)
                    rows["path"].append(path)
                    rows["cls"].append(c)
                    rows["start_idx"].append(s)
                    rows["end_idx"].append(e)
                    rows["score"].append(score)
            yield pd.DataFrame(rows)

    return corpus.select("repo", "path", "content").mapInPandas(
        extract, schema=HEAD_SCHEMA
    )


# ---------------------------------------------------------------- DuckDB

def _values_rows(mats: list[np.ndarray], codes: range) -> list[str]:
    """VALUES rows '(code, f0, f1, ...)' concatenating the given per-code
    matrices/vectors; floats in E-notation (%.16e: 17 significant digits
    round-trip float64 exactly, and DuckDB types E-literals as DOUBLE —
    plain decimal literals become DECIMAL and overflow on multiply)."""
    rows = []
    for code in codes:
        vals = []
        for m in mats:
            v = m[code]
            vals.extend(v.tolist() if v.ndim else [float(v)])
        rows.append(f"({code}, " + ", ".join(f"{x:.16e}" for x in vals) + ")")
    return rows


def _chars_cte(corpus_rel: str) -> str:
    return f"""
chars AS (
  SELECT repo, path, pos, least(unicode(ch), 255) AS code FROM (
    SELECT repo, path,
           CAST(unnest(range(length(content))) AS INT) AS pos,
           unnest(string_split(content, '')) AS ch
    FROM {corpus_rel}
  )
),
pairs AS (
  SELECT a.repo, a.path, a.pos AS start_idx, b.pos AS end_idx,
         a.code AS ca, b.code AS cb
  FROM chars a JOIN chars b
    ON a.repo = b.repo AND a.path = b.path AND a.pos <= b.pos
)""".strip()


def _cls_table(mats_per_class: list[np.ndarray], names: list[str], tname: str) -> str:
    """CTE 'tname(cls, code, <names>)' over classes x SQL_CODES."""
    rows = []
    n_classes = mats_per_class[0].shape[0]
    for c in range(n_classes):
        for r in _values_rows([m[c] for m in mats_per_class], range(SQL_CODES)):
            rows.append(f"({c}, " + r[1:])
    cols = ", ".join(names)
    return f"{tname}(cls, code, {cols}) AS (SELECT * FROM (VALUES {', '.join(rows)}) v)"


def _code_table(mats: list[np.ndarray], names: list[str], tname: str) -> str:
    rows = _values_rows(mats, range(SQL_CODES))
    cols = ", ".join(names)
    return f"{tname}(code, {cols}) AS (SELECT * FROM (VALUES {', '.join(rows)}) v)"


def _pos_table(cos: np.ndarray, sin: np.ndarray, hs: int) -> str:
    rows = []
    for p in range(cos.shape[0]):
        vals = cos[p].tolist() + sin[p].tolist()
        rows.append(f"({p}, " + ", ".join(f"{x:.16e}" for x in vals) + ")")
    cols = ", ".join([f"c{d}" for d in range(hs)] + [f"s{d}" for d in range(hs)])
    return f"pos(pos, {cols}) AS (SELECT * FROM (VALUES {', '.join(rows)}) v)"


def head_spans_duck_sql(head: str, corpus_rel: str = "corpus") -> str:
    """Exact DuckDB oracle for head_spans_factored(head): identical factor
    tables as VALUES literals, identical left-associated score arithmetic
    (see module docstring for why this is bitwise-equal, not just close)."""
    t = build_head_tables(head)
    thr = f"{t['thr']:.16e}"
    if t["kind"] == "bilinear":
        d_ = t["D"]
        hs_names = [f"h{d}" for d in range(d_)]
        ue_names = [f"u{d}" for d in range(d_)]
        score = " + ".join(f"h.h{d} * u.u{d}" for d in range(d_))
        return f"""
WITH {_chars_cte(corpus_rel)},
{_code_table([t["HS"]], hs_names, "hs")},
{_cls_table([t["UE"]], ue_names, "ue")}
SELECT repo, path, cls, start_idx, end_idx, score FROM (
  SELECT p.repo, p.path, CAST(u.cls AS INT) AS cls,
         p.start_idx, p.end_idx, ({score}) AS score
  FROM pairs p JOIN hs h ON h.code = p.ca JOIN ue u ON u.code = p.cb
) s WHERE score > {thr}
""".strip()
    if t["kind"] == "affine_bilinear":
        d_ = t["D"]
        score = "aa.a + bb.b + " + " + ".join(
            f"hw.w{d} * hh.h{d}" for d in range(d_)
        )
        return f"""
WITH {_chars_cte(corpus_rel)},
{_cls_table([t["A"], t["B"]], ["a", "b"], "ab")},
{_cls_table([t["HW4"]], [f"w{d}" for d in range(d_)], "hw")},
{_code_table([t["H"]], [f"h{d}" for d in range(d_)], "h")}
SELECT repo, path, cls, start_idx, end_idx, score FROM (
  SELECT p.repo, p.path, CAST(aa.cls AS INT) AS cls,
         p.start_idx, p.end_idx, ({score}) AS score
  FROM pairs p
  JOIN ab aa ON aa.code = p.ca
  JOIN ab bb ON bb.code = p.cb AND bb.cls = aa.cls
  JOIN hw ON hw.code = p.ca AND hw.cls = aa.cls
  JOIN h hh ON hh.code = p.cb
) s WHERE score > {thr}
""".strip()
    # rope heads. The rotation q_d = Q0*cos + Q0R*sin depends only on
    # (code, position), so it is materialized ONCE per character in `rot`
    # (O(n) rotations) and the pair stage is a self-join computing only the
    # per-dim products — the per-PAIR arithmetic (a.q_d * b.k_d summed
    # d-ascending, / norm, + bias) is textually unchanged, so the doubles
    # are bitwise identical to the unfactored form; only O(n^2) redundant
    # rotation work is removed (this cut the sf0.01 oracle severalfold).
    hs_ = t["HS"]
    norm = f"{t['NORM']:.16e}"
    qnames = [f"q{d}" for d in range(hs_)] + [f"r{d}" for d in range(hs_)] + \
             [f"k{d}" for d in range(hs_)] + [f"t{d}" for d in range(hs_)]
    rot_cols = ", ".join(
        f"qk.q{d} * p.c{d} + qk.r{d} * p.s{d} AS q{d}, "
        f"qk.k{d} * p.c{d} + qk.t{d} * p.s{d} AS k{d}"
        for d in range(hs_)
    )
    pair_dot = " + ".join(f"a.q{d} * b.k{d}" for d in range(hs_))
    pos_cte = _pos_table(t["COS"], t["SIN"], hs_)
    if t["BIAS"] is None:
        qk_cte = _cls_table([t["Q0"], t["Q0R"], t["K0"], t["K0R"]], qnames, "qk")
        return f"""
WITH {_chars_cte(corpus_rel)},
{qk_cte},
{pos_cte},
rot AS MATERIALIZED (
  SELECT c.repo, c.path, c.pos, qk.cls, {rot_cols}
  FROM chars c
  JOIN qk ON qk.code = c.code
  JOIN pos p ON p.pos = c.pos
)
SELECT repo, path, cls, start_idx, end_idx, score FROM (
  SELECT a.repo, a.path, CAST(a.cls AS INT) AS cls,
         a.pos AS start_idx, b.pos AS end_idx, ({pair_dot}) / {norm} AS score
  FROM rot a JOIN rot b
    ON a.repo = b.repo AND a.path = b.path AND a.cls = b.cls AND a.pos <= b.pos
) s WHERE score > {thr}
""".strip()
    # efficient_gp: shared projection + per-class rank-1 bias. The dot is
    # class-INdependent, so it is computed once per pair in a MATERIALIZED
    # CTE and only the rank-1 bias fans out over classes — without this the
    # optimizer re-evaluated the hs-term dot per (pair, class) inside a
    # 7-way join and the oracle did not finish at sf0.01. base = (dot)/norm
    # stored as a double then added to the bias term reproduces the Spark
    # path's op order exactly (m = m/norm; m = m + outer_bias/2.0).
    qk_cte = _code_table([t["Q0"][0], t["Q0R"][0], t["K0"][0], t["K0R"][0]], qnames, "qk")
    bias_cte = _code_table([t["BIAS"]], [f"b{c}" for c in range(t["C"])], "bias")
    # exactness-preserving prune before the class fan-out: score <= base +
    # max_c max_code BIAS, so base <= thr - maxb can never clear thr for any
    # class; the 1e-6 margin dwarfs double rounding at these magnitudes and
    # only keeps extra rows (never drops a survivor)
    maxb = float(t["BIAS"][:SQL_CODES].max())
    prune = f"{t['thr'] - maxb - 1e-6:.16e}"
    pick = lambda al: (  # noqa: E731 — tiny local SQL helper
        "CASE cl.cls " + " ".join(
            f"WHEN {c} THEN {al}.b{c}" for c in range(t["C"])
        ) + " END"
    )
    cls_rows = ", ".join(f"({c})" for c in range(t["C"]))
    return f"""
WITH {_chars_cte(corpus_rel)},
{qk_cte},
{bias_cte},
{pos_cte},
cl(cls) AS (SELECT * FROM (VALUES {cls_rows}) v),
rot AS MATERIALIZED (
  SELECT c.repo, c.path, c.pos, c.code, {rot_cols}
  FROM chars c
  JOIN qk ON qk.code = c.code
  JOIN pos p ON p.pos = c.pos
),
base AS MATERIALIZED (
  SELECT a.repo, a.path, a.pos AS start_idx, b.pos AS end_idx,
         a.code AS ca, b.code AS cb, ({pair_dot}) / {norm} AS base
  FROM rot a JOIN rot b
    ON a.repo = b.repo AND a.path = b.path AND a.pos <= b.pos
  WHERE ({pair_dot}) / {norm} > {prune}
)
SELECT repo, path, cls, start_idx, end_idx, score FROM (
  SELECT s.repo, s.path, CAST(cl.cls AS INT) AS cls,
         s.start_idx, s.end_idx,
         s.base + (({pick('ba')}) + ({pick('bb')})) / 2.0 AS score
  FROM base s
  CROSS JOIN cl
  JOIN bias ba ON ba.code = s.ca
  JOIN bias bb ON bb.code = s.cb
) s WHERE score > {thr}
""".strip()
