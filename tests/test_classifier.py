"""Hashed-BOW logistic regression: Spark vs a pure-Python reference
(same md5 hashing, same rounding schedule), learning on a separable
corpus, and the DuckDB oracle's bit-parity."""

import hashlib
import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from geos_spark.operators.classifier import (
    INIT_W,
    LR,
    ROUND_D,
    logreg_confusion,
    logreg_confusion_sql,
    logreg_weights,
    logreg_weights_sql,
)


def _bin(word: str, n_features: int) -> int:
    return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % n_features


def _ref_train(docs, n_features, iters, lr):
    """Independent reference: same featurization, GD, and rounding."""
    feats = []  # (doc_idx, {bin: x}, y)
    for _, text, y in docs:
        ws = re.findall("[a-z]+", (text or "").lower())
        if not ws:
            continue
        c = Counter(_bin(w, n_features) for w in ws)
        n = sum(c.values())
        x = {b: v / n for b, v in c.items()}
        x[n_features] = 1.0
        feats.append((x, float(y)))
    N = len(feats)
    w = [INIT_W] * (n_features + 1)
    for _ in range(iters):
        errs = []
        for x, y in feats:
            dot = round(sum(v * w[b] for b, v in x.items()), ROUND_D)
            errs.append((x, 1.0 / (1.0 + math.exp(-dot)) - y))
        g = [0.0] * (n_features + 1)
        for x, e in errs:
            for b, v in x.items():
                g[b] += e * v
        g = [round(v / N, ROUND_D) for v in g]
        w = [round(w[b] - lr * g[b], ROUND_D) for b in range(n_features + 1)]
    return w


# separable: class 1 speaks "alpha/beta/gamma", class 0 "delta/eps/zeta"
SEP_DOCS = [
    (i, " ".join(["alpha beta gamma alpha"] * 3), 1) for i in range(10)
] + [
    (i + 10, " ".join(["delta eps zeta delta"] * 3), 0) for i in range(10)
] + [
    (20, None, 0),      # NULL text: excluded from training and eval
    (21, "123 !!!", 1), # no words: excluded
]


def test_logreg_learns_separable_corpus(spark):
    df = spark.createDataFrame(SEP_DOCS, "doc_id long, text string, y int")
    conf = {
        (r.label, r.pred): r.n
        for r in logreg_confusion(
            df, F.col("y") == 1, n_features=16, iters=20, lr=1.0
        ).collect()
    }
    # perfectly separable vocab -> zero training error, word-less
    # docs absent from the counts
    assert conf == {(1, 1): 10, (0, 0): 10}


def test_logreg_weights_match_reference(spark):
    df = spark.createDataFrame(SEP_DOCS, "doc_id long, text string, y int")
    got = [
        r.weight
        for r in logreg_weights(
            df, F.col("y") == 1, n_features=16, iters=4
        ).collect()
    ]
    exp = _ref_train(SEP_DOCS, 16, 4, LR)
    assert got == exp


def test_logreg_oracle_matches_reference():
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    vals = ",".join(
        f"({i}, " + ("NULL" if t is None else "'" + t + "'") + f", {y})"
        for i, t, y in SEP_DOCS
    )
    con.execute(
        f"CREATE TABLE documents AS SELECT * FROM (VALUES {vals}) t(doc_id, text, y)"
    )
    ora = [
        r[1]
        for r in con.execute(
            logreg_weights_sql("y = 1", n_features=16, iters=4)
        ).fetchall()
    ]
    assert ora == _ref_train(SEP_DOCS, 16, 4, LR)
    conf = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            logreg_confusion_sql("y = 1", n_features=16, iters=20, lr=1.0)
        ).fetchall()
    }
    assert conf == {(1, 1): 10, (0, 0): 10}


def test_lr_default_produces_no_rounding_ties():
    # the tie analysis behind LR: 0.4 * d mod 10 is always even
    assert all((4 * d) % 10 != 5 for d in range(10))
    assert int(LR * 10) == 4


def test_model_quality_gate_combines_ppl_and_classifier(spark):
    from geos_spark.operators.curation import model_quality_gate

    # 9 scoreable docs: three repetitive (low ppl), three mixed,
    # three rare-vocab (high ppl / the tail bucket)
    docs = (
        [(i, "alpha beta alpha beta alpha beta", 1) for i in range(3)]
        + [(i + 3, "alpha gamma delta beta alpha mu", 1) for i in range(3)]
        + [(i + 6, f"zeta{'x' * i} eta theta iota kappa nu", 0) for i in range(3)]
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(docs, "doc_id long, text string, y int")
    out = {
        r.doc_id: (r.bucket, r.pred, r.keep)
        for r in model_quality_gate(
            df, F.col("y") == 1, n_buckets=3, n_features=16, iters=20
        ).collect()
    }
    assert len(out) == 9
    # NTILE(3) over 9 docs: three per bucket
    from collections import Counter

    assert Counter(b for b, _, _ in out.values()) == {1: 3, 2: 3, 3: 3}
    # keep implies: not tail bucket AND positive prediction
    for b, p, k in out.values():
        assert k == int(b < 3 and p == 1)
    # the repetitive docs (lowest self-perplexity, label 1) are kept
    assert all(out[i][2] == 1 for i in range(3))
    # tail-bucket docs are dropped regardless of prediction
    assert all(out[i][0] == 3 or out[i][2] == int(out[i][1] == 1) for i in range(6, 9))
