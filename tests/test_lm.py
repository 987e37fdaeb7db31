"""Corpus bigram LM / perplexity: Spark operator vs a pure-Python
reference, DuckDB oracle parity, and the threshold-bucket scale path."""

import math
import re
from collections import Counter

import pytest

from geos_spark.operators.lm import (
    bucket_by_thresholds,
    doc_perplexity,
    doc_perplexity_sql,
    ppl_buckets,
)

DOCS = [
    (0, "The cat sat on the mat. The cat sat again."),
    (1, "Spam spam spam spam spam buy now buy now buy now"),
    (2, "A rare sentence with unusual vocabulary entirely."),
    (3, "the cat sat on the mat"),
    (4, None),  # NULL text: no bigrams, excluded from output
    (5, "word"),  # single word: no bigrams, excluded from output
    (6, "!!! ??? 123"),  # no letter runs at all
]


def _ref_ppl(docs):
    toks = {i: re.findall("[a-z]+", (t or "").lower()) for i, t in docs}
    uni: Counter = Counter()
    bi: Counter = Counter()
    for ws in toks.values():
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    v = len(uni)
    out = {}
    for i, ws in toks.items():
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        lp = [math.log((bi[p] + 1.0) / (uni[p[0]] + float(v))) for p in pairs]
        out[i] = (len(pairs), round(math.exp(-sum(lp) / len(lp)), 6))
    return out


def test_doc_perplexity_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.ppl) for r in doc_perplexity(df).collect()}
    assert got == _ref_ppl(DOCS)
    # repetitive doc scores lower self-perplexity than the rare-word doc
    assert got[1][1] < got[2][1]
    # no-bigram docs are absent, not zero/NULL rows
    assert 4 not in got and 5 not in got and 6 not in got


def test_doc_perplexity_oracle_matches_reference():
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(
            f"({i}, " + ("NULL" if t is None else "'" + t.replace("'", "''") + "'") + ")"
            for i, t in DOCS
        )
        + ") t(doc_id, text)"
    )
    ora = {r[0]: (r[1], r[2]) for r in con.execute(doc_perplexity_sql()).fetchall()}
    assert ora == _ref_ppl(DOCS)


def test_ppl_buckets_partitions_all_docs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = ppl_buckets(df, n_buckets=2).collect()
    assert [r.bucket for r in rows] == [1, 2]
    assert sum(r.n_docs for r in rows) == len(_ref_ppl(DOCS))
    # head bucket holds the lower perplexities
    assert rows[0].max_ppl <= rows[1].min_ppl


def test_bucket_by_thresholds_matches_ntile_cuts(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    ppl = doc_perplexity(df)
    ref = _ref_ppl(DOCS)
    cut = sorted(p for _, p in ref.values())[len(ref) // 2]
    got = {
        r.doc_id: r.bucket
        for r in bucket_by_thresholds(ppl, [cut]).collect()
    }
    for i, (_, p) in ref.items():
        assert got[i] == (1 if p <= cut else 2)


def _ref_ppl_kn(docs, d=0.75):
    toks = {i: re.findall("[a-z]+", (t or "").lower()) for i, t in docs}
    uni: Counter = Counter()
    bi: Counter = Counter()
    for ws in toks.values():
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    nf: Counter = Counter()
    nb: Counter = Counter()
    for w1, w2 in bi:
        nf[w1] += 1
        nb[w2] += 1
    nbi = len(bi)
    out = {}
    for i, ws in toks.items():
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        lp = [
            math.log(
                max(bi[p] - d, 0.0) / uni[p[0]]
                + d * nf[p[0]] / uni[p[0]] * nb[p[1]] / nbi
            )
            for p in pairs
        ]
        out[i] = (len(pairs), round(math.exp(-sum(lp) / len(lp)), 6))
    return out


def test_doc_perplexity_kn_matches_reference(spark):
    from geos_spark.operators.lm import doc_perplexity_kn

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.ppl) for r in doc_perplexity_kn(df).collect()}
    assert got == _ref_ppl_kn(DOCS)
    # same no-bigram exclusions as the add-one path
    assert set(got) == set(_ref_ppl(DOCS))
    # KN also ranks the spam doc as more predictable than rare vocab
    assert got[1][1] < got[2][1]


def test_doc_perplexity_kn_oracle_matches_reference():
    from geos_spark.operators.lm import doc_perplexity_kn_sql

    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(
            f"({i}, " + ("NULL" if t is None else "'" + t.replace("'", "''") + "'") + ")"
            for i, t in DOCS
        )
        + ") t(doc_id, text)"
    )
    ora = {r[0]: (r[1], r[2]) for r in con.execute(doc_perplexity_kn_sql()).fetchall()}
    assert ora == _ref_ppl_kn(DOCS)


def _ref_ppl_kn3(docs, d=0.75):
    toks = {i: re.findall("[a-z]+", (t or "").lower()) for i, t in docs}
    bi: Counter = Counter()
    tri: Counter = Counter()
    for ws in toks.values():
        bi.update(zip(ws, ws[1:]))
        tri.update(zip(ws, ws[1:], ws[2:]))
    nf12: Counter = Counter()
    nb23: Counter = Counter()
    nmid: Counter = Counter()
    for w1, w2, w3 in tri:
        nf12[(w1, w2)] += 1
        nb23[(w2, w3)] += 1
        nmid[w2] += 1
    nf2: Counter = Counter()
    nb3: Counter = Counter()
    for w1, w2 in bi:
        nf2[w1] += 1
        nb3[w2] += 1
    nbi = len(bi)
    out = {}
    for i, ws in toks.items():
        trips = list(zip(ws, ws[1:], ws[2:]))
        if not trips:
            continue
        lp = []
        for w1, w2, w3 in trips:
            pc_uni = nb3[w3] / nbi
            pc_bi = (
                max(nb23[(w2, w3)] - d, 0.0) / nmid[w2]
                + d * nf2[w2] / nmid[w2] * pc_uni
            )
            p = (
                max(tri[(w1, w2, w3)] - d, 0.0) / bi[(w1, w2)]
                + d * nf12[(w1, w2)] / bi[(w1, w2)] * pc_bi
            )
            lp.append(math.log(p))
        out[i] = (len(trips), round(math.exp(-sum(lp) / len(lp)), 6))
    return out


def test_doc_perplexity_kn3_matches_reference(spark):
    from geos_spark.operators.lm import doc_perplexity_kn3

    docs = DOCS + [(7, "two words")]  # 2 words: no trigram, excluded
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_trigrams, r.ppl) for r in doc_perplexity_kn3(df).collect()}
    assert got == _ref_ppl_kn3(docs)
    assert 7 not in got


def test_doc_perplexity_kn3_oracle_matches_reference():
    from geos_spark.operators.lm import doc_perplexity_kn3_sql

    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    docs = DOCS + [(7, "two words")]
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(
            f"({i}, " + ("NULL" if t is None else "'" + t.replace("'", "''") + "'") + ")"
            for i, t in docs
        )
        + ") t(doc_id, text)"
    )
    ora = {r[0]: (r[1], r[2]) for r in con.execute(doc_perplexity_kn3_sql()).fetchall()}
    assert ora == _ref_ppl_kn3(docs)
