"""Web link-graph operators: href + anchor-text extraction,
host-level edge aggregation, PageRank, HITS, label-propagation
communities, and the anchor-text retrieval index.

The web-graph side of a crawl pipeline: pages carry anchors, the
pipeline extracts the edge list, collapses it to the host graph, and
ranks hosts (crawl prioritization / spam demotion — the original use).

Scale shapes:
- ``extract_links`` is a stateless projection (regexp_extract_all +
  explode), all JVM — the html column is read once, no python;
- ``host_edges`` is one shuffle keyed by (src_host, dst_host) with
  map-side partial counts;
- ``pagerank`` is the textbook iterative join-aggregate: each
  iteration shuffles rank contributions keyed by dst. Ranks are a
  2-column frame (host, double) — the 100 TB-scale cost is the edge
  re-shuffle per iteration, which Spark co-partitions after the first
  iteration (both sides hash on the join key; AQE reuses the
  exchange). For deep iteration counts pass ``checkpoint_every`` to
  truncate lineage (localCheckpoint), the standard guard against
  plan-depth blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HREF_RE = r'href="([^"]*)"'
HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]*)"


def extract_links(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """One row per anchor: (src_url, dst_url), in document order.

    ``regexp_extract_all`` over the decoded html — pure JVM, zero
    python; the explode fan-out is bounded by anchors-per-page.
    """
    html_str = F.col(html_col).cast("string")
    return pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(
            F.regexp_extract_all(html_str, F.lit(HREF_RE), F.lit(1))
        ).alias("dst_url"),
    )


def host_of(url) -> F.Column:
    """Host part of a URL column (scheme://HOST/...)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, HOST_RE, 1)


def host_edges(links: DataFrame) -> DataFrame:
    """Collapse the page-level link list to weighted host-level edges
    (src_host, dst_host, weight), self-loops dropped."""
    e = links.select(
        host_of("src_url").alias("src_host"),
        host_of("dst_url").alias("dst_host"),
    ).where(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("weight")
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    checkpoint_every: int | None = None,
    n_nodes: int | None = None,
    cache_edges: bool = True,
    weight_col: str | None = None,
    teleport: DataFrame | None = None,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """PageRank over the edge list, fixed iteration count:

        rank'(v) = (1-d)*p(v) + d * sum_{u->v} rank(u) * w(u,v)/W(u)

    Variants, all sharing this one iteration plan:

    - **unweighted** (default): w(u,v)=1, W(u)=outdeg(u);
    - **weighted** (``weight_col``): w is the named edge column,
      W(u) its per-source sum — the crawl-prioritization form where
      an edge repeated k times carries k× the endorsement;
    - **personalized / TrustRank** (``teleport``): p is a
      (host, p) distribution (need not cover every node; missing
      nodes teleport 0). Default p is uniform 1/N. With a teleport
      vector concentrated on trusted seed hosts this is TrustRank
      (Gyöngyi et al. 2004) — spam demotion by distance-from-trust;
    - **warm start / incremental** (``init_ranks``): rank⁰ seeded
      from a prior snapshot's ranks (missing/new nodes start at the
      teleport mass p(v), or 1/N when uniform). Re-ranking a crawl
      delta this way needs far fewer iterations than a cold start —
      the standard incremental recipe for evolving web graphs.

    Nodes are the union of sources and destinations; no dangling-mass
    redistribution (matches the closed-form SQL oracle — callers
    wanting stochastic-matrix semantics should ensure every node has
    an out-edge, as crawl host graphs effectively do).

    Returns (host, rank). Deterministic up to float summation order;
    the catalog queries round to 6 decimals.

    Scale shape is unchanged by the variants: teleport/init frames
    are node-sized 2-column frames joined once (teleport folds into a
    per-node ``base`` column before the loop); the weighted W(u) is
    the same single aggregate as outdeg.
    """
    # every iteration re-joins the edge list; without caching, an
    # upstream extraction pipeline would be re-executed per iteration
    # (plus once each for nodes and outdeg). Persist unless the
    # caller manages storage itself.
    if cache_edges:
        edges = edges.persist()
    nodes = (
        edges.select(F.col(src_col).alias("host"))
        .union(edges.select(F.col(dst_col).alias("host")))
        .distinct()
    )
    # N is a required scalar in the rank formula; an iterative
    # algorithm is a job, not a transformation factory, so counting
    # here is legitimate — but callers that know N (or computed it in
    # an earlier stage) pass it and keep this fully lazy.
    if n_nodes is None:
        nodes = nodes.persist()
        n_nodes = nodes.count()
    if n_nodes == 0:
        # empty graph: no nodes, no ranks (1/N is undefined)
        return nodes.select("host", F.lit(0.0).alias("rank")).limit(0)
    uniform = 1.0 / n_nodes
    # per-node teleport mass p(v): a column folded in BEFORE the loop
    # so each iteration stays one join-aggregate regardless of variant
    if teleport is not None:
        tp = teleport.select(
            F.col(teleport.columns[0]).alias("host"),
            F.col(teleport.columns[1]).cast("double").alias("__p"),
        )
        nodes = nodes.join(tp, on="host", how="left").select(
            "host", F.coalesce("__p", F.lit(0.0)).alias("__p")
        )
    else:
        nodes = nodes.withColumn("__p", F.lit(uniform))
    nodes = nodes.withColumn(
        "__base", F.lit(1.0 - damping) * F.col("__p")
    )
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    if weight_col:
        outdeg = edges.groupBy(src_col).agg(
            F.sum(w).alias("__w_tot")
        )
    else:
        outdeg = edges.groupBy(src_col).agg(
            F.count("*").cast("double").alias("__w_tot")
        )
    if init_ranks is not None:
        ir = init_ranks.select(
            F.col(init_ranks.columns[0]).alias("host"),
            F.col(init_ranks.columns[1]).cast("double").alias("__r0"),
        )
        ranks = nodes.join(ir, on="host", how="left").select(
            "host",
            "__base",
            F.coalesce(
                "__r0",
                F.col("__p") if teleport is not None else F.lit(uniform),
            ).alias("rank"),
        )
    else:
        ranks = nodes.select(
            "host",
            "__base",
            (F.col("__p") if teleport is not None else F.lit(uniform)
             ).alias("rank"),
        )
    for it in range(iterations):
        contrib = (
            edges.join(
                ranks.select(
                    F.col("host").alias(src_col), "rank"
                ),
                on=src_col,
            )
            .join(outdeg, on=src_col)
            .select(
                F.col(dst_col).alias("host"),
                (F.col("rank") * w / F.col("__w_tot")).alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = nodes.join(contrib, on="host", how="left").select(
            "host",
            "__base",
            (
                F.col("__base")
                + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
            ).alias("rank"),
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("host", "rank")


def pagerank_incremental(
    edges_new: DataFrame,
    prior_ranks: DataFrame,
    iterations: int = 2,
    **kwargs,
) -> DataFrame:
    """Incremental PageRank over a crawl delta: re-rank the NEW
    snapshot's edge list seeded from the PRIOR snapshot's ranks
    (``prior_ranks`` = (host, rank)). Hosts that appeared since the
    prior snapshot start at the teleport mass; hosts that vanished
    drop out with the node set. Because the seed is already near the
    fixed point for the unchanged bulk of the graph, a small fixed
    ``iterations`` (default 2) recovers the accuracy a cold start
    needs many more for — the standard recipe for evolving web
    graphs. Exactly ``pagerank(..., init_ranks=prior_ranks)``; same
    per-iteration plan shape (one edge join-aggregate)."""
    return pagerank(
        edges_new,
        iterations=iterations,
        init_ranks=prior_ranks,
        **kwargs,
    )


def hits(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    cache_edges: bool = True,
) -> DataFrame:
    """HITS (Kleinberg 1999): mutually-reinforcing hub and authority
    scores over the host graph, fixed iteration count with L2
    normalization each half-step:

        auth'(v) = sum_{u->v} hub(u)    then  auth /= ||auth||_2
        hub'(u)  = sum_{u->v} auth'(v)  then  hub  /= ||hub||_2

    Returns (host, hub, authority) for every node (nodes missing a
    score side carry 0.0). Same plan shape as :func:`pagerank`: the
    edge list is persisted across iterations, each half-step is one
    join-aggregate keyed by a host column, and the L2 norms ride as
    one-row broadcast frames.
    """
    if cache_edges:
        edges = edges.persist()
    nodes = (
        edges.select(F.col(src_col).alias("host"))
        .union(edges.select(F.col(dst_col).alias("host")))
        .distinct()
    )
    hub = nodes.withColumn("hub", F.lit(1.0))
    for _ in range(iterations):
        # each score frame is referenced TWICE downstream (by its own
        # norm aggregate and by the next half-step), so without a
        # lineage cut the plan subtree doubles per half-step — 4^iters
        # recomputation. localCheckpoint truncates it; the frames are
        # node-sized (tiny).
        auth = (
            edges.join(
                hub.withColumnRenamed("host", src_col), on=src_col
            )
            .groupBy(F.col(dst_col).alias("host"))
            .agg(F.sum("hub").alias("authority"))
        ).localCheckpoint(eager=True)
        anorm = auth.agg(
            F.sqrt(F.sum(F.col("authority") * F.col("authority"))).alias(
                "n"
            )
        )
        auth = auth.crossJoin(F.broadcast(anorm)).select(
            "host", (F.col("authority") / F.col("n")).alias("authority")
        )
        hub = (
            edges.join(
                auth.withColumnRenamed("host", dst_col), on=dst_col
            )
            .groupBy(F.col(src_col).alias("host"))
            .agg(F.sum("authority").alias("hub"))
        ).localCheckpoint(eager=True)
        hnorm = hub.agg(
            F.sqrt(F.sum(F.col("hub") * F.col("hub"))).alias("n")
        )
        hub = hub.crossJoin(F.broadcast(hnorm)).select(
            "host", (F.col("hub") / F.col("n")).alias("hub")
        )
    return (
        nodes.join(hub, on="host", how="left")
        .join(auth, on="host", how="left")
        .select(
            "host",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
    )


def bfs_depth(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 4,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    cache_edges: bool = True,
) -> DataFrame:
    """Multi-source BFS over the DIRECTED host graph: depth(v) is the
    length of the shortest link path from any seed host (crawl-depth
    labeling — "how many hops from the trusted frontier is this
    host?", the companion signal to TrustRank's continuous score).

    ``seeds``'s first column is the seed host list (depth 0). Hosts
    unreachable within ``max_depth`` hops are absent from the output.

    Plan shape per level: one edge join on the CURRENT frontier (not
    the whole visited set), a distinct, and an anti-join against the
    visited set — the textbook frontier BFS, so per-level cost tracks
    the frontier size, not the graph. Each new frontier is
    localCheckpoint'ed: it feeds both the next join and the running
    union, and BFS is a job, not a transformation factory (the
    per-level emptiness check is an action by design — it stops early
    on graphs shallower than ``max_depth``).

    Returns (host, depth:int).
    """
    if cache_edges:
        edges = edges.persist()
    known = (
        seeds.select(F.col(seeds.columns[0]).alias("host"))
        .distinct()
        .withColumn("depth", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = known
    for d in range(1, max_depth + 1):
        nxt = (
            edges.join(
                frontier.select(F.col("host").alias(src_col)),
                on=src_col,
            )
            .select(F.col(dst_col).alias("host"))
            .distinct()
            .join(known.select("host"), on="host", how="left_anti")
            .withColumn("depth", F.lit(d))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        known = known.union(nxt)
        frontier = nxt
    return known


def host_components(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Weakly-connected components of the host graph (mirror-farm /
    link-ring discovery): (host, component) with component = the
    lexicographically smallest host reachable ignoring direction.

    Hosts get dense long ids by rank of sorted host name, computed
    as a distributed prefix count (``sampling.global_rank``: range
    exchange + per-partition row_number + broadcast base offsets) —
    even though the host table is the DIMENSION (5-6 orders smaller
    than the page table), no stage collapses to a single task. The component computation itself is the
    contraction union-find used for geometry clustering
    (:func:`geos_spark.operators.cluster.connected_components`:
    per-partition local union-find, quotient-graph halving, bounded
    driver finish) — O(log) rounds of constant shuffle count. Because
    ids are rank-of-sorted-name, the min-id component representative
    IS the lexicographically smallest member, which is what the SQL
    oracle computes independently.
    """
    from geos_spark.operators.cluster import connected_components
    from geos_spark.operators.sampling import global_rank

    nodes = (
        edges.select(F.col(src_col).alias("host"))
        .union(edges.select(F.col(dst_col).alias("host")))
        .distinct()
    )
    ranked, _ = global_rank(nodes, ["host"])
    ids = ranked.withColumn(
        "id", (F.col("__rank") + 1).cast("long")
    ).drop("__rank").persist()
    pairs = (
        edges.select(
            F.col(src_col).alias("host"), F.col(dst_col).alias("__d")
        )
        .join(ids, on="host")
        .select(F.col("id").alias("id_a"), F.col("__d").alias("host"))
        .join(ids, on="host")
        .select("id_a", F.col("id").alias("id_b"))
    )
    comp = connected_components(ids.select("id"), pairs)
    rep = ids.select(
        F.col("id").alias("cluster"), F.col("host").alias("component")
    )
    return (
        comp.join(ids, on="id")
        .join(rep, on="cluster")
        .select("host", "component")
    )


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    cache_edges: bool = True,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over the
    UNDIRECTED host graph: labels start as the node's own id; each
    iteration every node adopts the most frequent label among its
    neighbors, ties broken by the lexicographically smallest label —
    fully deterministic, so the SQL oracle replays it exactly.

    Plan shape per iteration: one join (neighbor labels), one
    (node, label) count aggregate, one window top-1 per node; the
    label frame is localCheckpoint'ed per iteration (it is referenced
    by the next join AND analysis re-walks — same lineage-doubling
    guard as :func:`hits`). Returns (host, label) — nodes sharing a
    label are one community.
    """
    from pyspark.sql import Window

    if cache_edges:
        edges = edges.persist()
    sym = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).union(
        edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
    ).distinct()
    labels = sym.select(F.col("u").alias("host")).distinct().withColumn(
        "label", F.col("host")
    )
    w = Window.partitionBy("host").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    for _ in range(iterations):
        labels = (
            sym.join(
                labels.withColumnRenamed("host", "v"), on="v"
            )
            .groupBy(F.col("u").alias("host"), "label")
            .agg(F.count("*").alias("cnt"))
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("host", "label")
            .localCheckpoint(eager=True)
        )
    return labels


ANCHOR_RE = r'<a href="([^"]*)">([^<]*)</a>'


def extract_anchor_texts(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """One row per anchor with its text: (src_url, dst_url, anchor).

    Java regex and RE2 lack multi-group extract-all with one call, so
    the two capture groups are pulled with two ``regexp_extract_all``
    passes and zipped positionally — still a stateless all-JVM
    projection.
    """
    html_str = F.col(html_col).cast("string")
    pairs = F.arrays_zip(
        F.regexp_extract_all(html_str, F.lit(ANCHOR_RE), F.lit(1)).alias(
            "dst_url"
        ),
        F.regexp_extract_all(html_str, F.lit(ANCHOR_RE), F.lit(2)).alias(
            "anchor"
        ),
    )
    return pages.select(
        F.col(url_col).alias("src_url"), F.explode(pairs).alias("p")
    ).select("src_url", "p.dst_url", "p.anchor")


def anchor_text_index(anchors: DataFrame) -> DataFrame:
    """Aggregate anchor text per target: (dst_url, anchor, n_links,
    n_hosts) — the classic anchor-text retrieval index (how the rest
    of the web describes a page), with the distinct-source-host count
    as the spam-resistance weight.

    One shuffle keyed by (dst_url, anchor); distinct hosts via a
    partial-aggregated count(distinct).
    """
    return anchors.groupBy("dst_url", "anchor").agg(
        F.count("*").alias("n_links"),
        F.countDistinct(host_of("src_url")).alias("n_hosts"),
    )
