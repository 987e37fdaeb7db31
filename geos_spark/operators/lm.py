"""Corpus n-gram language model and perplexity-based quality filtering.

The CCNet pipeline (Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data") buckets web documents into
head/middle/tail by their perplexity under a language model; documents
in the tail are the classic low-quality web text. The repo's other
quality scores (`operators/text.py`, gopher_filter) are heuristic
ratios; this module adds the model-based signal: a word-bigram LM with
add-one smoothing trained *on the corpus itself* (self-perplexity — a
repetition/templatedness signal), and the bucketing on top.

Scale design:

- LM training is two hash aggregations over the tokenized corpus
  (unigram counts, bigram counts) — one scan, two shuffles, all JVM.
- Scoring joins each document's bigrams against the count tables:
  standard shuffle equijoins, no broadcast of corpus-sized state and
  no driver materialization. Because the LM is trained on the same
  corpus, every scored bigram exists in the table (inner joins).
- The vocabulary size V enters as a 1-row aggregate cross-joined in
  (Catalyst broadcasts it), keeping the whole plan declarative.
- Bucketing is an exact distributed NTILE: a range exchange plus
  per-partition ranks (the ``sampling.global_rank`` prefix-count
  shape) — no single-task window anywhere. For repeated production
  bucketing at 100 TB, ``bucket_by_thresholds`` with pre-computed
  (e.g. approx-quantile) boundaries is a pure narrow map.

Tokenization is lowercase ASCII letter runs (``[a-z]+``) — identical
semantics in Spark and DuckDB, and deliberately language-naive like
the repo's lang_guess n-gram tokenizer.

Determinism: perplexities are rounded to 6 decimals inside the
operator (both engines), and every ordering ties-break on doc_id, so
bucket assignment is bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WORD_RE = "[a-z]+"


def _materialize(df: DataFrame) -> DataFrame:
    """Cut lineage AND stop recomputation for a table consumed by
    several downstream plans (contract of cluster._materialize).
    The LM functions fan one tokenize scan into 3-8 count/score
    consumers; without this each consumer re-runs the regexp
    tokenization (or the n-gram aggregation) from the raw text."""
    try:
        return df.localCheckpoint(eager=True)
    except Exception:  # noqa: BLE001 - e.g. checkpointing disabled
        df = df.cache()
        df.count()
        return df


def _doc_words(
    df: DataFrame, id_col: str, text_col: str, word_re: str = WORD_RE
) -> DataFrame:
    """(id, ws array<string>) — lowercase letter-run tokens per doc."""
    return df.select(
        F.col(id_col),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(word_re), 0
        ).alias("ws"),
    )


def _doc_bigrams(words: DataFrame, id_col: str) -> DataFrame:
    """Explode each doc's adjacent word pairs; docs with <2 words
    contribute nothing (guard against Spark's descending sequence)."""
    ws = F.col("ws")
    pairs = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.struct(
                F.element_at(ws, i).alias("w1"),
                F.element_at(ws, i + F.lit(1)).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return words.select(
        F.col(id_col), F.explode(pairs).alias("pr")
    ).select(id_col, F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))


def doc_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_re: str = WORD_RE,
) -> DataFrame:
    """Per-document self-perplexity under the corpus bigram LM:
    (id_col, n_bigrams long, ppl double rounded to 6 decimals).

    p(w2|w1) = (C(w1,w2) + 1) / (C(w1) + V)  (add-one smoothing,
    V = corpus vocabulary size); ppl = exp(-mean log p) over the
    document's bigrams. Only documents with at least one bigram
    appear (a NULL-text or single-word doc has no perplexity — same
    filtered-output contract as bm25).
    """
    words = _materialize(_doc_words(df, id_col, text_col, word_re))
    docw = words.select(F.explode("ws").alias("w"))
    uni = docw.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    vocab = docw.agg(F.count_distinct("w").alias("v"))
    dbg = _doc_bigrams(words, id_col)
    bi = dbg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    scored = (
        dbg.join(bi, ["w1", "w2"])
        .join(uni, F.col("w1") == F.col("w"))
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.log(
                (F.col("c2") + F.lit(1.0))
                / (F.col("c1") + F.col("v").cast("double"))
            ).alias("logp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.exp(-F.avg("logp")), 6).alias("ppl"),
    )


def _global_rank(
    df: DataFrame, sort_cols: list[str], num_ranges: int = 64
) -> tuple[DataFrame, int]:
    """Shared distributed prefix-count rank — see
    ``operators/sampling.py::global_rank``."""
    from geos_spark.operators.sampling import global_rank

    return global_rank(df, sort_cols, num_ranges)


def ppl_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style quality buckets: rank documents by bigram-LM
    perplexity and NTILE into ``n_buckets`` (1 = head / lowest ppl,
    ``n_buckets`` = tail). Returns per-bucket aggregates:
    (bucket int, n_docs long, min_ppl, max_ppl, avg_ppl — doubles
    rounded to 6).

    The NTILE is computed as an exact distributed rank (range
    exchange + per-partition windows + broadcast base offsets — see
    ``_global_rank``) followed by SQL NTILE's closed-form bucket
    arithmetic, so there is no single-task global window anywhere.
    It runs on the already-rounded ppl with doc_id tie-break, making
    the cut points bit-stable across engines. For repeated production
    bucketing at 100 TB, ``bucket_by_thresholds`` (pre-computed
    quantile boundaries, a pure narrow map) avoids even the range
    exchange.
    """
    ppl = doc_perplexity(df, id_col, text_col)
    ranked, n = _global_rank(ppl, ["ppl", id_col])
    # SQL NTILE(k): first n%k buckets hold ceil(n/k) rows, the rest
    # floor(n/k) — closed form over the exact global rank
    q, rem = divmod(n, n_buckets) if n else (0, 0)
    r = F.col("__rank")
    if q == 0:
        bucket = (r + 1).cast("int")
    else:
        cut = F.lit((q + 1) * rem)
        bucket = (
            F.when(r < cut, F.floor(r / F.lit(q + 1)))
            .otherwise(F.lit(rem) + F.floor((r - cut) / F.lit(q)))
            + 1
        ).cast("int")
    return (
        ranked.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.min("ppl"), 6).alias("min_ppl"),
            F.round(F.max("ppl"), 6).alias("max_ppl"),
            F.round(F.avg("ppl"), 6).alias("avg_ppl"),
        )
        .orderBy("bucket")
    )


def bucket_by_thresholds(
    ppl_df: DataFrame,
    thresholds: list[float],
    ppl_col: str = "ppl",
) -> DataFrame:
    """The scale path for bucketing: assign buckets by comparing to
    pre-computed boundaries (e.g. from ``F.approx_percentile`` on a
    sample, or yesterday's run) — a pure narrow map, no global sort.
    bucket = 1 + number of thresholds strictly below the value."""
    b = F.lit(1)
    for t in thresholds:
        b = b + F.when(F.col(ppl_col) > F.lit(float(t)), 1).otherwise(0)
    return ppl_df.withColumn("bucket", b.cast("int"))


def doc_perplexity_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for :func:`doc_perplexity` (same tokenization,
    counts, smoothing, and 6-decimal rounding)."""
    return f"""WITH words AS (
  SELECT {id_col}, regexp_extract_all(lower({text_col}), '{WORD_RE}') AS ws
  FROM {table}
),
docw AS (SELECT unnest(ws) AS w FROM words),
uni AS (SELECT w, COUNT(*)::BIGINT AS c1 FROM docw GROUP BY w),
vocab AS (SELECT COUNT(DISTINCT w)::BIGINT AS v FROM docw),
dbg AS (
  SELECT {id_col}, pr.w1 AS w1, pr.w2 AS w2 FROM (
    SELECT {id_col}, unnest(list_transform(range(1, len(ws)),
             i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS pr
    FROM words
  )
),
bi AS (SELECT w1, w2, COUNT(*)::BIGINT AS c2 FROM dbg GROUP BY w1, w2),
scored AS (
  SELECT dbg.{id_col},
         ln((bi.c2 + 1.0) / (uni.c1 + vocab.v::DOUBLE)) AS logp
  FROM dbg JOIN bi USING (w1, w2) JOIN uni ON dbg.w1 = uni.w, vocab
)
SELECT {id_col}, COUNT(*)::BIGINT AS n_bigrams,
       ROUND(exp(-avg(logp)), 6) AS ppl
FROM scored GROUP BY {id_col}"""


def ppl_buckets_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 3,
) -> str:
    """DuckDB oracle for :func:`ppl_buckets`."""
    inner = doc_perplexity_sql(table, id_col, text_col)
    return f"""WITH ppl_t AS (
{inner}
),
bucketed AS (
  SELECT *, NTILE({n_buckets}) OVER (ORDER BY ppl ASC, {id_col} ASC) AS bucket
  FROM ppl_t
)
SELECT bucket::INT AS bucket, COUNT(*)::BIGINT AS n_docs,
       ROUND(MIN(ppl), 6) AS min_ppl, ROUND(MAX(ppl), 6) AS max_ppl,
       ROUND(AVG(ppl), 6) AS avg_ppl
FROM bucketed GROUP BY bucket ORDER BY bucket"""


KN_DISCOUNT = 0.75


def doc_perplexity_kn(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_re: str = WORD_RE,
    discount: float = KN_DISCOUNT,
) -> DataFrame:
    """Per-document self-perplexity under interpolated Kneser-Ney —
    the smoothing family KenLM (and therefore CCNet's quality model)
    actually uses, vs :func:`doc_perplexity`'s add-one:

        P(w2|w1) = max(c(w1,w2) - D, 0)/c(w1)
                   + D * N1+(w1,.)/c(w1) * N1+(.,w2)/N1+(..)

    where N1+(w1,.) counts distinct continuations of w1, N1+(.,w2)
    distinct left-contexts of w2, and N1+(..) all distinct bigrams
    (the continuation distribution: "how many contexts has this word
    completed", not "how often has it occurred").

    Same scale shape as the add-one path plus two vocabulary-sized
    count aggregations (distinct continuations / left-contexts are
    per-key counts over the already-distinct bigram table) and a
    1-row broadcast for N1+(..). Output (id_col, n_bigrams long,
    ppl double rounded to 6).
    """
    words = _materialize(_doc_words(df, id_col, text_col, word_re))
    docw = words.select(F.explode("ws").alias("w"))
    uni = docw.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    dbg = _doc_bigrams(words, id_col)
    bi = _materialize(
        dbg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    )
    n1_fwd = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("nf"))
    n1_bwd = bi.groupBy("w2").agg(F.count(F.lit(1)).alias("nb"))
    n_bi = bi.agg(F.count(F.lit(1)).alias("nbi"))
    d = F.lit(float(discount))
    scored = (
        dbg.join(bi, ["w1", "w2"])
        .join(uni, F.col("w1") == F.col("w"))
        .join(n1_fwd, "w1")
        .join(n1_bwd, "w2")
        .crossJoin(F.broadcast(n_bi))
        .select(
            F.col(id_col),
            F.log(
                F.greatest(F.col("c2") - d, F.lit(0.0)) / F.col("c1")
                + d
                * F.col("nf")
                / F.col("c1")
                * F.col("nb")
                / F.col("nbi")
            ).alias("logp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.exp(-F.avg("logp")), 6).alias("ppl"),
    )


def doc_perplexity_kn_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = KN_DISCOUNT,
) -> str:
    """DuckDB oracle for :func:`doc_perplexity_kn`."""
    return f"""WITH words AS (
  SELECT {id_col}, regexp_extract_all(lower({text_col}), '{WORD_RE}') AS ws
  FROM {table}
),
docw AS (SELECT unnest(ws) AS w FROM words),
uni AS (SELECT w, COUNT(*)::BIGINT AS c1 FROM docw GROUP BY w),
dbg AS (
  SELECT {id_col}, pr.w1 AS w1, pr.w2 AS w2 FROM (
    SELECT {id_col}, unnest(list_transform(range(1, len(ws)),
             i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS pr
    FROM words
  )
),
bi AS (SELECT w1, w2, COUNT(*)::BIGINT AS c2 FROM dbg GROUP BY w1, w2),
n1f AS (SELECT w1, COUNT(*)::BIGINT AS nf FROM bi GROUP BY w1),
n1b AS (SELECT w2, COUNT(*)::BIGINT AS nb FROM bi GROUP BY w2),
nbi AS (SELECT COUNT(*)::BIGINT AS nbi FROM bi),
scored AS (
  SELECT dbg.{id_col},
         ln(GREATEST(bi.c2 - {discount!r}, 0.0) / uni.c1
            + {discount!r} * n1f.nf / uni.c1 * n1b.nb / nbi.nbi) AS logp
  FROM dbg JOIN bi USING (w1, w2) JOIN uni ON dbg.w1 = uni.w
       JOIN n1f USING (w1) JOIN n1b USING (w2), nbi
)
SELECT {id_col}, COUNT(*)::BIGINT AS n_bigrams,
       ROUND(exp(-avg(logp)), 6) AS ppl
FROM scored GROUP BY {id_col}"""


def _doc_trigrams(words: DataFrame, id_col: str) -> DataFrame:
    """Explode each doc's adjacent word triples (same guard pattern
    as :func:`_doc_bigrams`)."""
    ws = F.col("ws")
    trips = F.when(
        F.size(ws) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 2),
            lambda i: F.struct(
                F.element_at(ws, i).alias("w1"),
                F.element_at(ws, i + F.lit(1)).alias("w2"),
                F.element_at(ws, i + F.lit(2)).alias("w3"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<w1:string,w2:string,w3:string>>")
    )
    return words.select(
        F.col(id_col), F.explode(trips).alias("tr")
    ).select(
        id_col,
        F.col("tr.w1").alias("w1"),
        F.col("tr.w2").alias("w2"),
        F.col("tr.w3").alias("w3"),
    )


def doc_perplexity_kn3(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_re: str = WORD_RE,
    discount: float = KN_DISCOUNT,
) -> DataFrame:
    """Trigram interpolated Kneser-Ney self-perplexity — the
    higher-order recursion KenLM ships (orders chain through
    continuation counts, never raw frequencies below the top):

        P(w3|w1,w2) = max(c123-D,0)/c12 + D*N1+(w1w2.)/c12 * Pc(w3|w2)
        Pc(w3|w2)   = max(N1+(.w2w3)-D,0)/N1+(.w2.)
                      + D*N1+(w2.)/N1+(.w2.) * Pc(w3)
        Pc(w3)      = N1+(.w3)/N1+(..)

    Every N1+ is a distinct-count aggregate over the distinct trigram
    / bigram tables (vocabulary-sized); scoring is seven equijoins of
    the per-doc trigram table against them plus a 1-row broadcast.
    Documents need >= 3 words (n_trigrams >= 1) to appear.
    """
    words = _materialize(_doc_words(df, id_col, text_col, word_re))
    dbg = _doc_bigrams(words, id_col)
    dtg = _doc_trigrams(words, id_col)
    bi = _materialize(
        dbg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    )
    tri = _materialize(
        dtg.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c123"))
    )
    nf12 = tri.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("nf12"))
    nb23 = tri.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("nb23"))
    nmid = tri.groupBy("w2").agg(F.count(F.lit(1)).alias("nmid"))
    nf2 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("nf2"))
    nb3 = bi.groupBy("w2").agg(F.count(F.lit(1)).alias("nb3"))
    nbi = bi.agg(F.count(F.lit(1)).alias("nbi"))
    d = F.lit(float(discount))
    pc_uni = F.col("nb3") / F.col("nbi")
    pc_bi = (
        F.greatest(F.col("nb23") - d, F.lit(0.0)) / F.col("nmid")
        + d * F.col("nf2") / F.col("nmid") * pc_uni
    )
    p = (
        F.greatest(F.col("c123") - d, F.lit(0.0)) / F.col("c12")
        + d * F.col("nf12") / F.col("c12") * pc_bi
    )
    scored = (
        dtg.join(tri, ["w1", "w2", "w3"])
        .join(bi, ["w1", "w2"])
        .join(nf12, ["w1", "w2"])
        .join(nb23, ["w2", "w3"])
        .join(nmid, "w2")
        .join(nf2.withColumnRenamed("w1", "w2"), "w2")
        .join(nb3.withColumnRenamed("w2", "w3"), "w3")
        .crossJoin(F.broadcast(nbi))
        .select(F.col(id_col), F.log(p).alias("logp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.round(F.exp(-F.avg("logp")), 6).alias("ppl"),
    )


def doc_perplexity_kn3_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = KN_DISCOUNT,
) -> str:
    """DuckDB oracle for :func:`doc_perplexity_kn3`."""
    return f"""WITH words AS (
  SELECT {id_col}, regexp_extract_all(lower({text_col}), '{WORD_RE}') AS ws
  FROM {table}
),
dbg AS MATERIALIZED (
  SELECT {id_col}, pr.w1 AS w1, pr.w2 AS w2 FROM (
    SELECT {id_col}, unnest(list_transform(range(1, len(ws)),
             i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS pr
    FROM words
  )
),
dtg AS MATERIALIZED (
  SELECT {id_col}, tr.w1 AS w1, tr.w2 AS w2, tr.w3 AS w3 FROM (
    SELECT {id_col}, unnest(list_transform(range(1, len(ws) - 1),
             i -> struct_pack(w1 := ws[i], w2 := ws[i+1], w3 := ws[i+2]))) AS tr
    FROM words
  )
),
bi AS MATERIALIZED (SELECT w1, w2, COUNT(*)::BIGINT AS c12 FROM dbg GROUP BY w1, w2),
tri AS MATERIALIZED (SELECT w1, w2, w3, COUNT(*)::BIGINT AS c123 FROM dtg GROUP BY w1, w2, w3),
nf12 AS (SELECT w1, w2, COUNT(*)::BIGINT AS nf12 FROM tri GROUP BY w1, w2),
nb23 AS (SELECT w2, w3, COUNT(*)::BIGINT AS nb23 FROM tri GROUP BY w2, w3),
nmid AS (SELECT w2, COUNT(*)::BIGINT AS nmid FROM tri GROUP BY w2),
nf2 AS (SELECT w1 AS w2, COUNT(*)::BIGINT AS nf2 FROM bi GROUP BY w1),
nb3 AS (SELECT w2 AS w3, COUNT(*)::BIGINT AS nb3 FROM bi GROUP BY w2),
nbi AS (SELECT COUNT(*)::BIGINT AS nbi FROM bi),
scored AS (
  SELECT dtg.{id_col},
         ln(GREATEST(tri.c123 - {discount!r}, 0.0) / bi.c12
            + {discount!r} * nf12.nf12 / bi.c12
              * (GREATEST(nb23.nb23 - {discount!r}, 0.0) / nmid.nmid
                 + {discount!r} * nf2.nf2 / nmid.nmid
                   * nb3.nb3 / nbi.nbi)) AS logp
  FROM dtg JOIN tri USING (w1, w2, w3) JOIN bi USING (w1, w2)
       JOIN nf12 USING (w1, w2) JOIN nb23 USING (w2, w3)
       JOIN nmid USING (w2) JOIN nf2 USING (w2) JOIN nb3 USING (w3), nbi
)
SELECT {id_col}, COUNT(*)::BIGINT AS n_trigrams,
       ROUND(exp(-avg(logp)), 6) AS ppl
FROM scored GROUP BY {id_col}"""
