"""Data-selection operators: DSIR-style importance weights.

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling") scores every raw document by the
log-likelihood ratio between a hashed n-gram model of a TARGET
distribution (e.g. curated text) and one of the RAW corpus, then
resamples by the weights. This module implements the unigram hashed
variant:

    bucket(w)  = md5_i64(w) mod B          (portable to any SQL)
    p_X(b)     = (c_X(b) + a) / (T_X + a*B)   add-a smoothing
    weight(d)  = mean over tokens w of  ln p_target(bucket(w))
                                      - ln p_raw(bucket(w))

Scale shape: both models are AT MOST ``buckets`` rows by construction
(the hashing is exactly what makes DSIR tractable at corpus scale) —
they broadcast; the corpus-side scan explodes tokens once, joins the
two tiny models, and aggregates per document. Two broadcast joins +
one doc-keyed shuffle, zero python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geos_spark.operators.dedup import md5_i64


def _token_buckets(
    df: DataFrame, text_col: str, id_col: str, buckets: int
) -> DataFrame:
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.col(text_col)), r"\s+")
        ).alias("w"),
    )
    return toks.select(
        id_col, F.pmod(md5_i64(F.col("w")), F.lit(buckets)).alias("b")
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document importance weight toward ``target``'s unigram
    distribution. Returns (id_col, n_toks, weight); higher = more
    target-like. Deterministic (portable md5 bucket hash); the
    smoothing constant ``alpha`` keeps unseen buckets finite.
    """
    ct = _token_buckets(target, text_col, id_col, buckets)
    cc = _token_buckets(corpus, text_col, id_col, buckets)
    tmodel = ct.groupBy("b").agg(F.count("*").alias("ctn"))
    cmodel = cc.groupBy("b").agg(F.count("*").alias("ccn"))
    # total-token scalars ride along as one-row broadcast frames
    ttot = tmodel.agg(F.sum("ctn").alias("T"))
    ctot = cmodel.agg(F.sum("ccn").alias("C"))
    doc_toks = _token_buckets(corpus, text_col, id_col, buckets)
    scored = (
        doc_toks.join(F.broadcast(tmodel), on="b", how="left")
        .join(F.broadcast(cmodel), on="b", how="left")
        .select(
            id_col,
            (
                F.log(F.coalesce("ctn", F.lit(0)) + F.lit(alpha))
                - F.log(F.coalesce("ccn", F.lit(0)) + F.lit(alpha))
            ).alias("lr"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_toks"),
        F.avg("lr").alias("lr_mean"),
    )
    aB = alpha * buckets
    const = (
        per_doc.crossJoin(F.broadcast(ttot))
        .crossJoin(F.broadcast(ctot))
        .select(
            id_col,
            "n_toks",
            (
                F.col("lr_mean")
                - F.log(F.col("T") + F.lit(aB))
                + F.log(F.col("C") + F.lit(aB))
            ).alias("weight"),
        )
    )
    # docs with no tokens are absent (explode drops them); callers
    # wanting them can left-join back with weight = ln prior ratio
    return const


def median_filter(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents at or above their group's exact median of
    ``value_col`` (adaptive per-language/per-domain thresholding —
    quantile cuts are how production filters set thresholds without
    hand-tuning constants per slice).

    Exact median (not approx_percentile) so the result is
    reproducible and oracle-checkable; the per-group medians are a
    tiny aggregate broadcast back onto the corpus scan.
    """
    med = df.groupBy(group_col).agg(
        F.median(value_col).alias("__med")
    )
    return (
        df.join(F.broadcast(med), on=group_col)
        .where(F.col(value_col) >= F.col("__med"))
        .withColumnRenamed("__med", "group_median")
    )


def mixture_rates(
    df: DataFrame,
    targets: dict[str, float],
    group_col: str = "lang",
    size_col: str = "n_chars",
) -> DataFrame:
    """Data-mixture calculator: given target proportions per group
    (language/source/domain), compute the deterministic per-group
    keep-rate that realizes the mixture from the current corpus.

    rate(g) = min(1, (target_g / max_g(target_g / tokens_g)) /
                     tokens_g)

    i.e. the group with the scarcest supply relative to its target is
    kept at 100% and every other group is downsampled to match — the
    standard no-upsampling mixing rule. Feed the rates into
    :func:`geos_spark.operators.sampling.stratified_sample` for the
    deterministic realization.

    One tiny aggregate + a broadcast target dim; emits (group,
    tokens, current_frac, target_frac, rate) rounded by the caller.
    """
    spark = df.sparkSession
    tdim = spark.createDataFrame(
        [(g, float(w)) for g, w in sorted(targets.items())],
        schema=f"{group_col} string, target_frac double",
    )
    sup = df.groupBy(group_col).agg(
        F.sum(size_col).cast("double").alias("tokens")
    )
    tot = sup.agg(F.sum("tokens").alias("tot"))
    j = (
        sup.join(F.broadcast(tdim), on=group_col, how="inner")
        .crossJoin(F.broadcast(tot))
        .withColumn("current_frac", F.col("tokens") / F.col("tot"))
        .withColumn("supply_ratio", F.col("target_frac") / F.col("tokens"))
    )
    # the binding group: max(target/tokens) over included groups
    bind = j.agg(F.max("supply_ratio").alias("bind"))
    return (
        j.crossJoin(F.broadcast(bind))
        .withColumn(
            "rate",
            F.least(
                F.lit(1.0),
                F.col("target_frac")
                / F.col("bind")
                / F.col("tokens"),
            ),
        )
        .select(
            group_col, "tokens", "current_frac", "target_frac", "rate"
        )
    )


def model_quality_gate(
    df: DataFrame,
    label,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 3,
    n_features: int = 64,
    iters: int = 5,
) -> DataFrame:
    """The model-based curation decision (the tier DCLM/CCNet add on
    top of heuristic rules): per document, its bigram-LM perplexity
    bucket and its learned-classifier prediction, combined into one
    keep bit — keep = not in the perplexity tail AND classifier
    positive.

    Returns (id_col, bucket int, pred int, keep int) — all integers,
    so the row set is exactly reproducible. Documents with no
    scoreable bigrams are excluded (they cannot be perplexity-ranked;
    the heuristic gates already handle degenerate docs).

    Composition of the oracle-gated pieces: ``lm.doc_perplexity`` +
    the exact distributed NTILE (``sampling.global_rank``) +
    ``classifier.logreg_confusion``'s training/scoring path. One
    corpus scan per stage, no single-task stages, classifier weights
    enter as array literals.
    """
    from geos_spark.operators.classifier import hashed_features, train_logreg
    from geos_spark.operators.lm import _global_rank, doc_perplexity

    ppl = doc_perplexity(df, id_col, text_col)
    ranked, n = _global_rank(ppl, ["ppl", id_col])
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
    bucketed = ranked.select(id_col, bucket.alias("bucket"))

    feats = hashed_features(df, label, id_col, text_col, n_features)
    w = train_logreg(feats, n_features, iters, id_col=id_col)
    from geos_spark.operators.classifier import ROUND_D

    w_arr = F.array(*[F.lit(float(v)) for v in w])
    scored = hashed_features(df, label, id_col, text_col, n_features).groupBy(
        id_col
    ).agg(
        F.round(
            F.sum(F.col("x") * F.element_at(w_arr, F.col("bin") + 1)), ROUND_D
        ).alias("dot")
    )
    pred = F.when(F.col("dot") > 0, 1).otherwise(0)
    return (
        bucketed.join(scored, id_col)
        .select(
            id_col,
            "bucket",
            pred.alias("pred"),
            (
                (F.col("bucket") < F.lit(n_buckets)) & (pred == 1)
            ).cast("int").alias("keep"),
        )
    )
