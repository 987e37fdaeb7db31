"""Distributed learned quality/language classifier (fastText-style).

Modern curation pipelines train a *learned* filter over hashed
bag-of-words features (fastText in CCNet; the DCLM baseline's quality
classifier) and keep documents the model scores highly. This module
implements that shape natively on DataFrames: hashed-BOW featurization,
batch-gradient-descent logistic regression, and confusion-matrix
evaluation — with a DuckDB oracle that replays the identical arithmetic
(unrolled iterations), so training itself is correctness-gated.

Scale design:

- Featurization is one corpus scan: explode words, portable-md5 hash
  into ``n_features`` bins, one (doc, bin) count aggregation. The
  feature table — the only data-sized state — is persisted once and
  reused by every GD iteration.
- Each iteration is two shuffles, all JVM: (1) per-doc dot products
  (the weight vector enters as a 65-element array *literal* — no join
  against a weight table), (2) per-bin gradient aggregation. The
  gradient/weight vectors are model-sized (n_features+1 rows) and live
  on the driver, like every SGD parameter server's reduced state.
- The bias is feature bin ``n_features`` with constant x=1, so one
  gradient formula covers all parameters.

Cross-engine determinism (the interesting part — floating-point GD
that two engines reproduce bit-for-bit):

- per-doc dot products and per-bin gradients are ROUNDed to 9 decimals
  *inside* the aggregation step, so unordered-sum ulp noise (and the
  engines' exp() implementations differing in the last ulp) is
  quantized away at every iteration boundary;
- weight updates are elementwise on identical rounded inputs, rounded
  again to 9;
- predictions threshold the rounded dot at 0 (sign test — no exp in
  the decision), so the confusion matrix is exact integers.

Feature hashing uses the engine's portable md5-prefix integer
(``operators/dedup.py::md5_i64``), replayable in any SQL engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geos_spark.operators.dedup import md5_i64
from geos_spark.operators.lm import WORD_RE

N_FEATURES = 64
ROUND_D = 9
# Non-zero init is load-bearing for cross-engine determinism: with
# w = 0, iteration 1 has p = 0.5 exactly, and on corpora with
# round word counts the gradients become exact decimal rationals
# sitting precisely ON the 1e-9 rounding boundary — where Spark's
# BigDecimal HALF_UP and DuckDB's float rounding disagree. Any
# non-zero dot makes p = sigmoid(dot) a generic double and pushes
# tie probability to ~1e-15/1e-9 per value (measure-zero).
INIT_W = 0.001
# Default lr avoids a second tie source: with 9-decimal-exact w and g,
# the update w - lr*g has an exact 10th decimal of (10*lr mod 10) * d
# mod 10; lr = 0.5 makes it 5 exactly whenever g's last digit is odd —
# a rounding tie where Python's correctly-rounded round() and DuckDB's
# multiply-then-round disagree. lr = 0.4 yields only even 10th digits
# (0/2/4/6/8), never a tie.
LR = 0.4


def hashed_features(
    df: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = N_FEATURES,
    word_re: str = WORD_RE,
) -> DataFrame:
    """(id, bin, x, y): L1-normalized hashed-BOW features plus the
    constant bias feature (bin = n_features, x = 1.0). Only documents
    with at least one word participate. ``label`` is a Column over the
    input rows evaluating to 0.0/1.0."""
    words = df.select(
        F.col(id_col),
        label.cast("double").alias("y"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(word_re), 0)
        ).alias("w"),
    )
    binned = words.select(
        id_col, "y", (md5_i64(F.col("w")) % n_features).cast("int").alias("bin")
    )
    cnt = binned.groupBy(id_col, "y", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = cnt.groupBy(id_col).agg(F.sum("c").alias("n"))
    feats = cnt.join(tot, id_col).select(
        id_col, "y", "bin", (F.col("c") / F.col("n")).alias("x")
    )
    bias = tot.join(
        cnt.select(id_col, "y").distinct(), id_col
    ).select(
        id_col, "y", F.lit(n_features).cast("int").alias("bin"),
        F.lit(1.0).alias("x"),
    )
    return feats.unionByName(bias)


def train_logreg(
    feats: DataFrame,
    n_features: int = N_FEATURES,
    iters: int = 5,
    lr: float = LR,
    id_col: str = "doc_id",
) -> list[float]:
    """Batch-GD logistic regression over a :func:`hashed_features`
    table; returns the learned weight vector (length n_features+1,
    last entry = bias), every value rounded to 9 decimals.

    w starts at INIT_W (see the module constant for why non-zero);
    each iteration computes p = sigmoid(dot), mean gradient per bin,
    and w <- round(w - lr * g, 9).
    """
    feats = feats.persist()
    n_docs = feats.where(F.col("bin") == n_features).count()
    w = [INIT_W] * (n_features + 1)
    for _ in range(iters):
        w_arr = F.array(*[F.lit(float(v)) for v in w])
        doc = feats.groupBy(id_col).agg(
            F.round(
                F.sum(F.col("x") * F.element_at(w_arr, F.col("bin") + 1)),
                ROUND_D,
            ).alias("dot"),
            F.first("y").alias("y"),
        )
        err = doc.select(
            id_col,
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("dot"))) - F.col("y")).alias("e"),
        )
        g_rows = (
            feats.join(err, id_col)
            .groupBy("bin")
            .agg(F.round(F.sum(F.col("e") * F.col("x")) / n_docs, ROUND_D).alias("g"))
            .collect()
        )
        g = {r.bin: r.g for r in g_rows}
        w = [round(w[b] - lr * g.get(b, 0.0), ROUND_D) for b in range(n_features + 1)]
    feats.unpersist()
    return w


def logreg_weights(
    df: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = N_FEATURES,
    iters: int = 5,
    lr: float = LR,
) -> DataFrame:
    """Train and return the model as a DataFrame (bin int, weight
    double) — bin n_features is the bias. Model-sized output."""
    feats = hashed_features(df, label, id_col, text_col, n_features)
    w = train_logreg(feats, n_features, iters, lr, id_col)
    return df.sparkSession.createDataFrame(
        list(enumerate(w)), "bin int, weight double"
    )


def logreg_confusion(
    df: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = N_FEATURES,
    iters: int = 5,
    lr: float = LR,
) -> DataFrame:
    """Train, then evaluate on the training corpus: confusion counts
    (label int, pred int, n long), prediction = sign of the rounded
    dot product (no exp in the decision). Lazy distributed plan."""
    feats = hashed_features(df, label, id_col, text_col, n_features)
    w = train_logreg(feats, n_features, iters, lr, id_col)
    w_arr = F.array(*[F.lit(float(v)) for v in w])
    doc = hashed_features(df, label, id_col, text_col, n_features).groupBy(
        id_col
    ).agg(
        F.round(
            F.sum(F.col("x") * F.element_at(w_arr, F.col("bin") + 1)), ROUND_D
        ).alias("dot"),
        F.first("y").alias("y"),
    )
    return (
        doc.select(
            F.col("y").cast("int").alias("label"),
            F.when(F.col("dot") > 0, 1).otherwise(0).alias("pred"),
        )
        .groupBy("label", "pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _feats_sql(
    table: str, id_col: str, text_col: str, label_sql: str,
    n_features: int, word_re: str = WORD_RE,
) -> str:
    return f"""binned AS (
  SELECT {id_col}, y,
         (CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % {n_features})::INT AS bin
  FROM (
    SELECT {id_col}, ({label_sql})::DOUBLE AS y,
           unnest(regexp_extract_all(lower({text_col}), '{word_re}')) AS w
    FROM {table}
  )
),
cnt AS (SELECT {id_col}, y, bin, COUNT(*)::BIGINT AS c
        FROM binned GROUP BY {id_col}, y, bin),
tot AS (SELECT {id_col}, SUM(c)::BIGINT AS n FROM cnt GROUP BY {id_col}),
feats AS MATERIALIZED (
  SELECT cnt.{id_col}, y, bin, c::DOUBLE / n AS x FROM cnt JOIN tot USING ({id_col})
  UNION ALL
  SELECT DISTINCT cnt.{id_col}, y, {n_features}::INT AS bin, 1.0 AS x
  FROM cnt
),
nn AS (SELECT COUNT(*)::BIGINT AS n FROM tot),
w0 AS MATERIALIZED (SELECT unnest(range(0, {n_features + 1}))::INT AS bin,
              {INIT_W!r} AS weight)"""


def _iter_sql(t: int, id_col: str, lr: float) -> str:
    # AS MATERIALIZED is load-bearing: each w{t} is referenced twice
    # (dot{t} and w{t+1}), so un-materialized CTE inlining expands the
    # chain 2^iters-fold — 20 unrolled iterations would never finish.
    return f"""dot{t} AS MATERIALIZED (
  SELECT f.{id_col}, ROUND(SUM(f.x * w.weight), {ROUND_D}) AS dot,
         MIN(f.y) AS y
  FROM feats f JOIN w{t} w USING (bin) GROUP BY f.{id_col}
),
g{t} AS MATERIALIZED (
  SELECT f.bin,
         ROUND(SUM((1.0/(1.0+exp(-d.dot)) - d.y) * f.x) / (SELECT n FROM nn),
               {ROUND_D}) AS g
  FROM feats f JOIN dot{t} d USING ({id_col}) GROUP BY f.bin
),
w{t + 1} AS MATERIALIZED (
  SELECT w.bin, ROUND(w.weight - {lr!r} * COALESCE(g.g, 0.0), {ROUND_D}) AS weight
  FROM w{t} w LEFT JOIN g{t} g USING (bin)
)"""


def logreg_weights_sql(
    label_sql: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = N_FEATURES,
    iters: int = 5,
    lr: float = LR,
) -> str:
    """DuckDB oracle for :func:`logreg_weights` (unrolled GD)."""
    parts = ["WITH " + _feats_sql(table, id_col, text_col, label_sql, n_features)]
    for t in range(iters):
        parts.append(_iter_sql(t, id_col, lr))
    return (
        ",\n".join(parts)
        + f"\nSELECT bin, weight FROM w{iters} ORDER BY bin"
    )


def logreg_confusion_sql(
    label_sql: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = N_FEATURES,
    iters: int = 5,
    lr: float = LR,
) -> str:
    """DuckDB oracle for :func:`logreg_confusion`."""
    parts = ["WITH " + _feats_sql(table, id_col, text_col, label_sql, n_features)]
    for t in range(iters):
        parts.append(_iter_sql(t, id_col, lr))
    parts.append(
        f"""final_dot AS (
  SELECT f.{id_col}, ROUND(SUM(f.x * w.weight), {ROUND_D}) AS dot,
         MIN(f.y) AS y
  FROM feats f JOIN w{iters} w USING (bin) GROUP BY f.{id_col}
)"""
    )
    return (
        ",\n".join(parts)
        + """
SELECT y::INT AS label, (CASE WHEN dot > 0 THEN 1 ELSE 0 END)::INT AS pred,
       COUNT(*)::BIGINT AS n
FROM final_dot GROUP BY 1, 2"""
    )


def logreg_scores_sql(
    label_sql: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = N_FEATURES,
    iters: int = 5,
    lr: float = LR,
) -> str:
    """DuckDB oracle fragment for per-document final dot products
    (id, dot) — the scoring half of :func:`logreg_confusion`, exposed
    for composition (curate_model)."""
    parts = ["WITH " + _feats_sql(table, id_col, text_col, label_sql, n_features)]
    for t in range(iters):
        parts.append(_iter_sql(t, id_col, lr))
    return (
        ",\n".join(parts)
        + f"""
SELECT f.{id_col}, ROUND(SUM(f.x * w.weight), {ROUND_D}) AS dot
FROM feats f JOIN w{iters} w USING (bin) GROUP BY f.{id_col}"""
    )
