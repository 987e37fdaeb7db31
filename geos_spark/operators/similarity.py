"""Similarity search over embedding columns.

- brute-force cosine top-k (the exactness baseline): broadcast the
  query side, compute dot products with native ``F.aggregate`` /
  ``F.zip_with`` (sequential left-fold, deterministic), window top-k.
- LSH-bucketed variant (the scale path): random-hyperplane signatures
  bucket vectors; candidates searched per-bucket only.

All arithmetic in float64 with a deterministic fold order so an
external SQL oracle reproduces values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Deterministic sequential-fold dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (q_id, rank, vec_id, cosine). Self-matches excluded.
    Ties break by vec_id ascending (deterministic).
    """
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("v_norm"),
    )
    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).alias("q"),
        norm(F.col(q_vec_col)).alias("q_norm"),
    )
    # broadcast the QUERY side and stream the vector corpus: the
    # nested-loop product is then distributed over the big side's
    # partitions (each scans the small broadcast query set), never a
    # shuffle of the corpus. For large query sets use cosine_topk_lsh.
    scored = (
        v.join(F.broadcast(q), F.col("q_id") != F.col("vec_id"))
        .withColumn(
            "cosine",
            dot(F.col("q"), F.col("v"))
            / (F.col("q_norm") * F.col("v_norm")),
        )
        .select("q_id", "vec_id", "cosine")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cosine")
    )


def cosine_topk_matmul(
    vectors: DataFrame,
    queries_pdf,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_bytes: int = 512 << 20,
) -> DataFrame:
    """Throughput variant of exact top-k: the query block is shipped
    as a numpy matrix inside a ``mapInPandas`` closure; each Arrow
    batch of the corpus computes one BLAS matmul and keeps only its
    per-batch top-k rows, so the shuffle into the final global top-k
    is O(partitions * Q * k), never O(Q * N).

    **Query-block bound (the serving-shape contract):** the block
    costs ``Q * dim * 8`` bytes in the driver AND in every task's
    deserialized closure — a 10^5-query x 64-dim block is ~50 MB
    (fine, pinned by a test); the default ``max_query_bytes`` of
    512 MB rejects blocks that would OOM executors with a clear
    escalation message.  When Q approaches corpus size the problem is
    all-pairs, not serving: use ``cosine_topk_lsh`` (bucket equijoin)
    or ``embedding_neardup_pairs`` (banded LSH) — both shuffle on hash
    keys and never materialize a query block anywhere.

    Summation order is BLAS-defined (not the sequential fold of
    ``cosine_topk``), so scores can differ from the oracle in the last
    ulp — ranks are stable for non-degenerate data. ``queries_pdf`` is
    a pandas DataFrame with columns (q_id, q_vec).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    qm = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in queries_pdf["q_vec"]]
    )
    if qm.nbytes > max_query_bytes:
        raise ValueError(
            f"query block is {qm.nbytes >> 20} MiB "
            f"(> max_query_bytes={max_query_bytes >> 20} MiB); this "
            "operator ships the block into every task closure — batch "
            "the queries, or for Q ~ corpus use cosine_topk_lsh / "
            "embedding_neardup_pairs (all-pairs shapes, no query block)"
        )
    q_ids = np.asarray(queries_pdf["q_id"], dtype=np.int64)
    q_norms = np.sqrt((qm * qm).sum(axis=1))

    schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def _score(batches):
        for pdf in batches:
            vm = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if not len(vm):
                continue
            vids = np.asarray(pdf[id_col], dtype=np.int64)
            vn = np.sqrt((vm * vm).sum(axis=1))
            cos = (qm @ vm.T) / (q_norms[:, None] * vn[None, :])
            cos[q_ids[:, None] == vids[None, :]] = -np.inf  # self
            top = min(k, cos.shape[1])
            part = np.argpartition(-cos, top - 1, axis=1)[:, :top]
            rows = {
                "q_id": np.repeat(q_ids, top),
                "vec_id": vids[part.ravel()],
                "cosine": np.take_along_axis(cos, part, axis=1).ravel(),
            }
            out = pd.DataFrame(rows)
            yield out[out["cosine"] > -np.inf]

    scored = vectors.select(id_col, vec_col).mapInPandas(_score, schema)
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cosine")
    )


def _centroid_scores(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Array of (cosine, -centroid_id) structs of ``vec`` against a
    literal centroid list — pure Catalyst expressions, evaluated
    per-row with NO join and NO shuffle. ``array_max`` / descending
    ``array_sort`` over the struct then picks the best-scoring
    centroid with ties broken by LOWEST id (hence the negated id as
    the second struct field)."""
    nv = norm(vec)
    items = []
    for cid, cv in centroids:
        lit_c = F.array(*[F.lit(float(x)) for x in cv])
        cn = sum(x * x for x in cv) ** 0.5
        items.append(
            F.struct(
                (dot(vec, lit_c) / (nv * F.lit(cn))).alias("s"),
                F.lit(-int(cid)).cast("long").alias("nid"),
            )
        )
    return F.array(*items)


def ivf_assign(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its inverted list: argmax cosine against
    the centroid literals, ties to the lowest centroid id. A pure
    per-row projection (Catalyst HOF fold + ``array_max``) — the plan
    contains NO Exchange, which is the property that lets a 100 TB
    corpus be quantized in place. Returns (vec_id, v, v_norm,
    list_id)."""
    scores_v = _centroid_scores(F.col(vec_col), centroids)
    return vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("v_norm"),
        (-F.array_max(scores_v)["nid"]).alias("list_id"),
    )


def cosine_topk_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """IVF-style approximate top-k cosine search (the classic
    inverted-file ANN layout: Faiss IVFFlat / SPANN coarse-quantize +
    probe shape).

    - **Codebook**: the ``n_lists`` lowest-id corpus vectors serve as
      pivot centroids. Deterministic and SQL-reproducible (so the
      whole operator is oracle-exact), while preserving the IVF
      execution shape — in production the codebook would come from a
      sampled k-means fit, which swaps only this list.
    - **Assignment** (corpus -> inverted list): argmax cosine against
      the centroid literals via Catalyst higher-order functions —
      per-row JVM compute, ZERO shuffle and no join. At 100 TB this is
      the step that must not move data; here it provably doesn't.
    - **Probe**: each query expands to its ``n_probe`` best centroids
      (descending ``array_sort`` + ``slice`` + ``explode`` — native).
    - **Search**: equijoin probe-lists x inverted lists (bucketed —
      work is O(sum of probed list sizes), never Q x N), exact cosine
      inside, window top-k. Ties break by vec_id ascending.

    Returns (q_id, rank, vec_id, cosine). Self-matches excluded.
    Approximate by design: a true neighbor assigned to an unprobed
    list is missed; recall rises with ``n_probe`` (= exact at
    ``n_probe == n_lists``).
    """
    cents = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in vectors.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(n_lists)
        .collect()
    ]

    inv = ivf_assign(vectors, cents, id_col=id_col, vec_col=vec_col)

    scores_q = _centroid_scores(F.col(q_vec_col), cents)
    probed = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).alias("q"),
        norm(F.col(q_vec_col)).alias("q_norm"),
        F.explode(
            F.slice(F.reverse(F.array_sort(scores_q)), 1, n_probe)
        ).alias("__c"),
    ).withColumn("list_id", -F.col("__c")["nid"]).drop("__c")

    scored = (
        probed.join(inv, "list_id")
        .where(F.col("q_id") != F.col("vec_id"))
        .withColumn(
            "cosine",
            dot(F.col("q"), F.col("v")) / (F.col("q_norm") * F.col("v_norm")),
        )
        .select("q_id", "vec_id", "cosine")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cosine")
    )


def cosine_topk_ivf_blas(
    vectors: DataFrame,
    queries_pdf,
    k: int = 5,
    n_lists: int = 64,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Throughput variant of :func:`cosine_topk_ivf` — the layout a
    distributed IVF actually deploys: the corpus is partitioned BY
    INVERTED LIST, and each list partition computes one BLAS matmul
    against only the queries that probe it.

    - assignment: per-Arrow-batch BLAS argmax against the centroid
      matrix (``mapInPandas``, no shuffle);
    - the one shuffle is ``repartition(list_id)`` — at production
      scale this is the *indexing* step, written once as the table's
      partitioning and amortized over every query batch;
    - search: ``applyInPandas`` per list; compute per list is
      |probing queries| x |list| — total work ~``n_probe/n_lists`` of
      brute force, and a list probed by nobody is never scored (with
      storage partitioned by list it would not even be scanned).

    Scores are BLAS-summed (last-ulp vs the sequential fold); ranks
    agree with :func:`cosine_topk_ivf` for non-degenerate corpora —
    pinned in tests. ``queries_pdf``: pandas (q_id, q_vec).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cents = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in vectors.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(n_lists)
        .collect()
    ]
    cm = np.asarray([c[1] for c in cents], dtype=np.float64)
    cids = np.asarray([c[0] for c in cents], dtype=np.int64)
    cn = np.sqrt((cm * cm).sum(axis=1))

    qm = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in queries_pdf["q_vec"]]
    )
    if qm.size == 0:
        qm = qm.reshape(0, cm.shape[1])  # empty query set
    q_ids = np.asarray(queries_pdf["q_id"], dtype=np.int64)
    q_norms = np.sqrt((qm * qm).sum(axis=1))

    def _best_lists(mat, norms, n):
        # scores against centroids; ties to the LOWEST centroid id —
        # cids is ascending, so a stable argsort on (-score) suffices
        s = (mat @ cm.T) / (norms[:, None] * cn[None, :])
        return np.argsort(-s, axis=1, kind="stable")[:, :n]

    # query -> probed lists, computed driver-side (Q x n_lists is tiny)
    probe_idx = _best_lists(qm, q_norms, n_probe)
    # per-list probing-query index, shipped in the search closure
    probers = {
        int(li): np.where((probe_idx == li).any(axis=1))[0]
        for li in range(len(cents))
    }

    assign_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("list_idx", T.IntegerType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
        ]
    )

    def _assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            vn = np.sqrt((vm * vm).sum(axis=1))
            li = _best_lists(vm, vn, 1)[:, 0]
            yield pd.DataFrame(
                {
                    "vec_id": np.asarray(pdf[id_col], dtype=np.int64),
                    "list_idx": li.astype(np.int32),
                    "v": list(vm),
                }
            )

    assigned = vectors.select(id_col, vec_col).mapInPandas(
        _assign, assign_schema
    )

    out_schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def _search(pdf):
        li = int(pdf["list_idx"].iloc[0])
        qi = probers.get(li)
        if qi is None or not len(qi) or not len(pdf):
            return pd.DataFrame(
                {"q_id": [], "vec_id": [], "cosine": []}
            ).astype({"q_id": "int64", "vec_id": "int64", "cosine": "float64"})
        vm = np.asarray([np.asarray(v) for v in pdf["v"]])
        vids = np.asarray(pdf["vec_id"], dtype=np.int64)
        vn = np.sqrt((vm * vm).sum(axis=1))
        sub_q = qm[qi]
        sub_ids = q_ids[qi]
        sub_n = q_norms[qi]
        cos = (sub_q @ vm.T) / (sub_n[:, None] * vn[None, :])
        cos[sub_ids[:, None] == vids[None, :]] = -np.inf  # self
        top = min(k, cos.shape[1])
        part = np.argpartition(-cos, top - 1, axis=1)[:, :top]
        out = pd.DataFrame(
            {
                "q_id": np.repeat(sub_ids, top),
                "vec_id": vids[part.ravel()],
                "cosine": np.take_along_axis(cos, part, axis=1).ravel(),
            }
        )
        return out[out["cosine"] > -np.inf]

    scored = assigned.groupBy("list_idx").applyInPandas(_search, out_schema)
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cosine")
    )


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Add an LSH ``bucket`` column: sign pattern of n random
    hyperplanes (deterministic pseudo-random planes from the seed)."""
    import numpy as np

    rs = np.random.RandomState(seed)
    planes = rs.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        d = dot(F.col(vec_col), plane)
        bucket = bucket + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket)


def cosine_topk_lsh(
    vectors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 16,
    max_bucket: int | None = None,
) -> DataFrame:
    """Approximate all-pairs top-k: candidates share an LSH bucket.

    The scale path: each bucket is a tiny local join instead of a full
    cross product. Recall depends on n_planes; exactness is *not*
    guaranteed (approximate by design).

    ``max_bucket`` (rows) caps the self-join fan-out of a hot bucket —
    the same guard as dedup's banded LSH: one bucket holding m rows
    produces m² candidate pairs, so a single degenerate bucket (e.g.
    the all-zeros embedding region) can go quadratic on the whole
    job. Capped buckets are dropped entirely (approximate by design;
    raise n_planes to split hot regions instead of raising the cap).
    """
    b = hyperplane_buckets(vectors, vec_col, n_planes, dim)
    if max_bucket is not None:
        counts = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("__bn"))
        b = b.join(
            F.broadcast(counts.where(F.col("__bn") <= max_bucket)),
            "bucket",
        ).drop("__bn")
    left = b.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q"),
        norm(F.col(vec_col)).alias("q_norm"),
        "bucket",
    )
    right = b.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("v_norm"),
        "bucket",
    )
    scored = (
        left.join(right, "bucket")
        .where(F.col("q_id") != F.col("vec_id"))
        .withColumn(
            "cosine",
            dot(F.col("q"), F.col("v")) / (F.col("q_norm") * F.col("v_norm")),
        )
        .select("q_id", "vec_id", "cosine")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cosine")
    )


def cosine_topk_ivfpq(
    vectors: DataFrame,
    queries_pdf,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    m_subspaces: int = 8,
    ks: int = 16,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ approximate top-k cosine search — the compressed-index
    tier above :func:`cosine_topk_ivf_blas` (Faiss IVFPQ / ScaNN
    layout): vectors live in inverted lists as ``m_subspaces``
    one-byte-ish codes, candidates are scored by asymmetric distance
    (ADC table lookups, no per-vector dot products), and the top
    ``refine*k`` ADC candidates are re-ranked exactly.

    At 100 TB the wins are (i) the searched representation is
    m_subspaces codes per vector (~8 B instead of 8*dim B — a 64x
    compression at dim 64) so whole lists fit in memory, and (ii)
    ADC replaces O(dim) per candidate with O(m) table lookups; the
    exact re-rank touches only refine*k rows per query.

    Determinism (and hence SQL-reproducibility of the pipeline):
    coarse centroids are the ``n_lists`` lowest-id vectors and the PQ
    codebook of each subspace is the normalized subvectors of the
    ``ks`` lowest-id vectors — pivot codebooks, same convention as
    :func:`cosine_topk_ivf`. Production swaps in sampled k-means
    fits; every execution property above is unchanged.

    Output: (q_id, rank, vec_id, cosine) with EXACT cosine for the
    emitted rows (re-ranked), ties by vec_id.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    head = [
        (int(r[0]), np.asarray(r[1], dtype=np.float64))
        for r in vectors.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(max(n_lists, ks))
        .collect()
    ]
    dim = len(head[0][1])
    if dim % m_subspaces != 0:
        raise ValueError("dim must be divisible by m_subspaces")
    sub = dim // m_subspaces

    cm = np.stack([v for _, v in head[:n_lists]])
    cn = np.sqrt((cm * cm).sum(axis=1))

    # PQ codebooks: (m, ks, sub) — normalized pivot subvectors
    pivots = np.stack([v for _, v in head[:ks]])
    pn = np.sqrt((pivots * pivots).sum(axis=1, keepdims=True))
    pn[pn == 0] = 1.0
    pivots_hat = pivots / pn
    books = np.stack(
        [
            pivots_hat[:, m * sub : (m + 1) * sub]
            for m in range(m_subspaces)
        ]
    )

    qm = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in queries_pdf["q_vec"]]
    )
    if qm.size == 0:
        qm = qm.reshape(0, dim)
    q_ids = np.asarray(queries_pdf["q_id"], dtype=np.int64)
    q_norms = np.sqrt((qm * qm).sum(axis=1))
    qs = (qm @ cm.T) / (q_norms[:, None] * cn[None, :])
    probe_idx = np.argsort(-qs, axis=1, kind="stable")[:, :n_probe]
    probers = {
        int(li): np.where((probe_idx == li).any(axis=1))[0]
        for li in range(n_lists)
    }
    qhat = qm / q_norms[:, None]
    # per-query ADC tables: T[q, m, j] = dot(sub_m(q_hat), book[m, j])
    adc = np.einsum(
        "qms,mjs->qmj",
        qhat.reshape(len(qm), m_subspaces, sub),
        books,
    )

    enc_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("list_idx", T.IntegerType()),
            T.StructField("code", T.ArrayType(T.IntegerType())),
            T.StructField("v", T.ArrayType(T.DoubleType())),
        ]
    )

    def _encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            vn = np.sqrt((vm * vm).sum(axis=1))
            li = np.argsort(
                -(vm @ cm.T) / (vn[:, None] * cn[None, :]),
                axis=1,
                kind="stable",
            )[:, 0]
            safe = vn.copy()
            safe[safe == 0] = 1.0
            vhat = (vm / safe[:, None]).reshape(
                len(vm), m_subspaces, sub
            )
            # nearest codeword per subspace (L2 on normalized vecs)
            d = (
                (vhat[:, :, None, :] - books[None, :, :, :]) ** 2
            ).sum(axis=3)
            codes = d.argmin(axis=2).astype(np.int32)
            yield pd.DataFrame(
                {
                    "vec_id": np.asarray(pdf[id_col], dtype=np.int64),
                    "list_idx": li.astype(np.int32),
                    "code": list(codes),
                    "v": list(vm),
                }
            )

    encoded = vectors.select(id_col, vec_col).mapInPandas(
        _encode, enc_schema
    )

    out_schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def _search(pdf):
        empty = pd.DataFrame(
            {"q_id": [], "vec_id": [], "cosine": []}
        ).astype(
            {"q_id": "int64", "vec_id": "int64", "cosine": "float64"}
        )
        li = int(pdf["list_idx"].iloc[0])
        qi = probers.get(li)
        if qi is None or not len(qi) or not len(pdf):
            return empty
        codes = np.asarray(
            [np.asarray(c, dtype=np.int64) for c in pdf["code"]]
        )
        vids = np.asarray(pdf["vec_id"], dtype=np.int64)
        # ADC: approx[q, i] = sum_m adc[q, m, codes[i, m]]
        sub_adc = adc[qi]  # (nq, m, ks)
        nq = len(qi)
        approx = np.zeros((nq, len(vids)))
        for m in range(m_subspaces):
            approx += sub_adc[:, m, :][:, codes[:, m]]
        approx[q_ids[qi][:, None] == vids[None, :]] = -np.inf
        cand = min(refine * k, approx.shape[1])
        # exact re-rank of the ADC candidates only
        vm = np.asarray([np.asarray(v) for v in pdf["v"]])
        vn = np.sqrt((vm * vm).sum(axis=1))
        sub_q = qm[qi]
        sub_n = q_norms[qi]
        rows = []
        for r in range(nq):
            # deterministic candidate cut: ADC desc, vec_id asc.
            # Equal PQ codes give bit-equal ADC scores, so an
            # argpartition boundary inside such a tie group would be
            # arbitrary — the explicit tiebreak makes the approximate
            # output reproducible (and SQL-replicable) at any sf
            idx = np.lexsort((vids, -approx[r]))[:cand]
            idx = idx[approx[r, idx] > -np.inf]
            if not len(idx):
                continue
            exact = (vm[idx] @ sub_q[r]) / (vn[idx] * sub_n[r])
            rows.append(
                pd.DataFrame(
                    {
                        "q_id": q_ids[qi][r],
                        "vec_id": vids[idx],
                        "cosine": exact,
                    }
                )
            )
        if not rows:
            return empty
        return pd.concat(rows, ignore_index=True)

    scored = encoded.groupBy("list_idx").applyInPandas(
        _search, out_schema
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cosine")
    )


def semdedup(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 3,
    tau: float = 0.454,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): embedding-space
    near-duplicate pruning BLOCKED BY k-means cluster — the published
    trick that turns the quadratic all-pairs cosine into per-cluster
    products, because semantic duplicates land in the same cluster.

    Keep rule (deterministic variant): a vector is dropped iff some
    SAME-CLUSTER vector with a smaller id lies within cosine >= tau.
    Returns (id_col, cid int, keep int) for every input vector.

    Scale shape: the k-means rounds are the checkpointed jobs of
    ``cluster.kmeans_assign``; candidate generation is a cid-keyed
    self-equijoin (shuffle on cid — per-cluster products only, the
    SemDeDup point); the cosine is the deterministic sequential fold
    shared with the ANN operators, so engines agree to the last bit
    and a tau chosen clear of the pair spectrum cannot flip.
    """
    from geos_spark.operators.cluster import kmeans_assign

    km = kmeans_assign(emb, k=k, iterations=iterations).select(
        F.col("vec_id"), F.col("cid")
    )
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("nv"),
    )
    j = km.join(e, "vec_id")
    a = j.select(
        F.col("cid"),
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("va"),
        F.col("nv").alias("na"),
    )
    b = j.select(
        F.col("cid"),
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("vb"),
        F.col("nv").alias("nb"),
    )
    losers = (
        a.join(b, "cid")
        .where(F.col("a_id") < F.col("b_id"))
        .where(
            dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            >= F.lit(float(tau))
        )
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("__drop", F.lit(1))
    )
    return (
        km.join(losers, "vec_id", "left")
        .select(
            F.col("vec_id").alias(id_col),
            F.col("cid").cast("int").alias("cid"),
            F.when(F.col("__drop").isNull(), 1).otherwise(0).alias("keep"),
        )
    )
