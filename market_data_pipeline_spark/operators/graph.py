"""Graph analytics over derived relationship graphs — the co-purchase
graph (parts linked by appearing in the same order) and anything else
shaped (src, dst[, weight]).

North-star operators (BASELINE.json): a 100 TB training-data pipeline
runs link-graph analytics constantly — host-level PageRank as a document
quality prior (the Common Crawl ranking signal), degree distributions to
find spam hubs, triangle counts / clustering coefficients to separate
organic link neighborhoods from farms. The reference has no graph surface
at all (its analytics stop at per-symbol indicators) — this module is
beyond-parity, built from the TPC-H-ish tables the driver provides.

Scale design, per operator:

- ``copurchase_edges``: ONE groupBy(order) with collect_set (map-side
  combinable, baskets are small), pair generation as a per-row
  higher-order array expression (no self-join, no explode-then-join),
  then one (src,dst) aggregation. Two shuffles total at any scale. The
  ``max_basket`` cap bounds the quadratic pair fan-out per basket: a
  degenerate 100k-item basket would otherwise emit 5e9 pairs from one
  row — capped baskets keep the deterministic ``max_basket`` smallest
  ids (documented recall bound, mirrored in the SQL oracle).
- ``triangle_stats``: degree-ordered orientation (Latapy / Schank-Wagner)
  — every edge points from the (degree, id)-smaller endpoint to the
  larger, so out-degree is O(sqrt(m)) and the wedge self-join is
  sum(outdeg²) ≪ sum(deg²); the id-ordered naive join would quadratically
  blow up on hub nodes exactly where a 100 TB graph has them.
- ``pagerank``: the canonical iterative-join loop — ranks live keyed by
  node, contributions shuffle on dst once per iteration, the rank frame
  is localCheckpoint-ed every round so lineage stays O(1) (the same
  discipline as k-means and connected components). In-loop 1e-10
  quantization (the quantized-Lloyd's trick from ``similarity.kmeans_fit``)
  makes the iterate independent of floating-point summation order, so the
  whole fixpoint is bit-reproducible across partitionings AND engines —
  which is what lets a chained-CTE SQL unrolling (DuckDB oracle) match
  every rank exactly.
"""

from __future__ import annotations

import math
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_data_pipeline_spark.sources.tables import load_table

# Shared rounding nudge: moves values that land within float noise of an
# exact .5 decimal-rounding boundary off it identically on both engines
# (see __spark_entry__.SQL_W8 for the convention's origin).
_EPS = 1e-13

# Target per-task row volume inside iterative loops (see _loop_shuffle).
_LOOP_ROWS_PER_TASK = 300_000

# Iterative loops whose per-round join carries a node-keyed state frame
# (labels, ranks) may broadcast that frame instead of shuffling the
# edge-sized side every round — but ONLY when the node universe is small
# enough to ship: ~50 MB of unsafe rows at two longs per node. Above the
# bound the loop keeps the shuffle path, so the choice is data-derived,
# never a small-cluster constant (guide §3.1: pick the strategy
# deliberately; the state frame is counted, not estimated). Overridable
# via SPARK_GRAFT_LOOP_BCAST_NODES for cluster-memory tuning.
_LOOP_BCAST_MAX_NODES = int(
    __import__("os").environ.get("SPARK_GRAFT_LOOP_BCAST_NODES", 1_000_000)
)


@contextmanager
def _loop_shuffle(spark: SparkSession, n_rows: int, rows_per_task: int | None = None):
    """Pin an iterative loop's shuffle width to its data volume.

    An iterative graph loop executes dozens of tiny shuffle stages; under
    AQE each stage materializes as its own scheduler job, and at the
    session-wide shuffle width each stage launches mostly-empty tasks.
    Measured (r7, sf0.1 pagerank): ~60% of wall time was fixed per-job /
    per-task scheduling overhead — 7.1 s at the 32-partition session
    width vs 3.7 s with the loop width pinned to the data. The width is
    DERIVED, not constant: ceil(edge_rows / 300k) rows per task, so at
    100× the same loop plans ~100× the partitions — the rule is
    scale-free, never a small-cluster constant baked into the operator.

    AQE is disabled inside the window because per-stage re-planning is
    pure overhead here: stage sizes are known up front (the loop re-runs
    the same two exchanges on the same frames every round) and the keys
    are hash-uniform node ids. Trade-off: AQE skew-join splitting is off
    inside the loop, so a pathological hub key stays in one task — the
    per-basket / fan-out caps upstream bound that, and callers with
    unbounded hub skew should salt before looping. Both confs are
    restored on exit; every job the loop triggers (eager checkpoints and
    the closing checkpoint) executes inside the window, so the caller's
    downstream plan still runs under the session's own settings.

    SESSION-GLOBAL side effect: the two confs are SparkSession-wide, so
    any query or streaming micro-batch another thread plans on the SAME
    session during the window silently runs at the pinned width with AQE
    off (plans already running are unaffected — confs bind at planning).
    This repo executes queries sequentially so the window is private;
    library callers that share a session across threads should hand the
    loop a cloned session (``spark.newSession()`` shares the SparkContext
    but isolates SQL confs) or serialize around the loop.

    ``rows_per_task`` overrides the default 300k target — the optimum is
    operator-specific (r8 interleaved A/B at sf0.1 AND the 100× replica):
    pagerank's adjacency join likes 300k (100k measured +25% at sf0.1),
    while HITS's two skinny half-steps like 100k (−33% at sf0.1, −20% at
    100×: smaller per-task hash tables, more waves over the cores, less
    straggler exposure). Both are data-derived; neither bakes in a
    cluster size.
    """
    p = max(1, math.ceil(n_rows / (rows_per_task or _LOOP_ROWS_PER_TASK)))
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", str(p))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def _ordered_pairs(array_col: str, pair):
    """All ordered pairs (a[i], a[j]) with i < j from a sorted array
    column, expanded per-row inside codegen (no join, no explode-then-
    join); ``pair(x, y)`` builds the output struct. The fiddly slice
    arithmetic — 1-based start i+2, length size−i−1, floor at 0 for the
    last element — lives here once for both the basket pair expansion and
    the triangle wedge generation."""
    return F.flatten(
        F.transform(
            array_col,
            lambda x, i: F.transform(
                F.slice(
                    F.col(array_col),
                    i + F.lit(2),
                    F.greatest(F.size(array_col) - i - 1, F.lit(0)),
                ),
                lambda y: pair(x, y),
            ),
        )
    )


def edges_from_baskets(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    min_weight: int = 1,
    max_basket: int = 64,
) -> DataFrame:
    """Undirected co-occurrence edges from (basket, item) rows: items
    a < b linked with weight = number of baskets containing both.

    Plan: groupBy(basket) → sorted distinct item array (collect_set is
    map-side combinable; baskets are bounded) → pairs via a nested
    ``transform`` over the sorted array (pure expression, runs inside
    codegen, no join) → groupBy(src, dst) count. Two shuffles total.

    ``max_basket`` keeps the N smallest item ids per basket before
    pairing: per-row fan-out is then ≤ C(max_basket, 2) however
    degenerate the basket — a 100k-item basket would otherwise emit 5e9
    pairs from one row. The cap is deterministic (smallest ids) and
    mirrored in the SQL oracle so capped semantics stay value-checked.
    """
    baskets = items.groupBy(F.col(basket_col).alias("__bk")).agg(
        F.slice(F.array_sort(F.collect_set(item_col)), 1, max_basket).alias("parts")
    )
    # pairs (parts[i], parts[j]) for i < j — the array is sorted, so
    # src < dst holds and each unordered pair appears exactly once
    pairs = baskets.select(
        F.explode(
            _ordered_pairs(
                "parts", lambda x, y: F.struct(x.alias("src"), y.alias("dst"))
            )
        ).alias("e")
    )
    return (
        pairs.groupBy(F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
        .agg(F.count(F.lit(1)).alias("weight"))
        .filter(F.col("weight") >= min_weight)
    )


def association_rules(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    k: int = 50,
    max_basket: int = 64,
) -> DataFrame:
    """Market-basket association rules over (basket, item) rows: for every
    ordered item pair co-occurring in ≥ ``min_pair_count`` baskets, the
    classic Agrawal-style rule metrics — support = P(a,b), confidence =
    P(b|a), lift = P(a,b) / (P(a)·P(b)) — top-k by lift. Both directions
    of each unordered pair are emitted (same support, different
    confidence).

    Plan: ONE groupBy(basket) into capped sorted item arrays
    (checkpointed — it feeds the pair expansion, the item supports, and
    the basket count), pair fan-out as a per-row codegen'd array
    expression (no self-join; ≤ C(max_basket,2) per row, the same
    deterministic smallest-ids cap as ``edges_from_baskets``, mirrored in
    the SQL oracle), then item-keyed joins on the O(items) support table.
    All metrics are integer ratios with a pinned double-division order,
    so the oracle matches exactly.
    """
    baskets = (
        items.groupBy(F.col(basket_col).alias("__bk"))
        .agg(
            F.slice(F.array_sort(F.collect_set(item_col)), 1, max_basket).alias(
                "parts"
            )
        )
        .localCheckpoint(eager=True)
    )
    tot = baskets.agg(F.count(F.lit(1)).alias("__nb"))
    isup = (
        baskets.select(F.explode("parts").alias("__it"))
        .groupBy("__it")
        .agg(F.count(F.lit(1)).alias("__s"))
    )
    pairs = (
        baskets.select(
            F.explode(
                _ordered_pairs(
                    "parts", lambda x, y: F.struct(x.alias("src"), y.alias("dst"))
                )
            ).alias("e")
        )
        .groupBy(F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
        .agg(F.count(F.lit(1)).alias("__w"))
        .filter(F.col("__w") >= min_pair_count)
    )
    rules = pairs.select(
        F.col("src").alias("antecedent"), F.col("dst").alias("consequent"), "__w"
    ).unionByName(
        pairs.select(
            F.col("dst").alias("antecedent"), F.col("src").alias("consequent"), "__w"
        )
    )
    d = lambda c: c.cast("double")  # noqa: E731
    return (
        rules.join(
            isup.select(F.col("__it").alias("antecedent"), F.col("__s").alias("__sa")),
            "antecedent",
        )
        .join(
            isup.select(F.col("__it").alias("consequent"), F.col("__s").alias("__sc")),
            "consequent",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "antecedent",
            "consequent",
            F.col("__w").cast("long").alias("pair_count"),
            F.round(d(F.col("__w")) / d(F.col("__nb")) + 1e-12, 6).alias("support"),
            F.round(d(F.col("__w")) / d(F.col("__sa")) + 1e-12, 6).alias("confidence"),
            F.round(
                (d(F.col("__w")) * d(F.col("__nb")))
                / (d(F.col("__sa")) * d(F.col("__sc")))
                + 1e-12,
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "antecedent", "consequent")
        .limit(k)
    )


def link_prediction(
    edges: DataFrame, k: int = 50, max_neighbors: int = 256
) -> DataFrame:
    """Neighborhood-based link prediction (Liben-Nowell & Kleinberg 2003):
    for every NON-adjacent node pair sharing ≥1 neighbor, the common-
    neighbor count and neighborhood-Jaccard score cn/(deg(a)+deg(b)−cn),
    top-k — 'which products will be co-purchased next' over the
    co-purchase graph, the same primitive behind people-you-may-know.

    Plan: wedge generation as a per-row codegen'd pair expansion over
    sorted CAPPED neighbor arrays (Σ min(deg,cap)² fan-out — the
    ``max_basket`` discipline: a hub node would otherwise emit deg²
    wedges from one row; the cap keeps the deterministic smallest
    neighbor ids, mirrored in the oracle, and bounds the recall loss to
    hub-mediated pairs), one (a,b)-keyed count, an anti-join against the
    existing edge set, then node-sized degree joins. Degrees are FULL
    (uncapped) — only wedge enumeration is capped.

    r9 (guide §3.3 — materialize the frame every consumer reads): the
    checkpoint moved from ``sym`` to the EDGE frame itself. The old shape
    re-derived the (often expensive — e.g. basket self-join) edge plan for
    the adjacency anti-join, which read ``edges``, not ``sym``; now sym /
    degrees / neighbors / anti-join all read the one materialized edge
    RDD (half the size of sym, computed once). Same-JVM A/B on the
    co-purchase graph: 3.8-4.9 s → 2.2-2.7 s, hash-identical.
    """
    ed = edges.select("src", "dst").localCheckpoint(eager=True)
    sym = ed.unionAll(
        ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    nbrs = sym.groupBy(F.col("src").alias("n")).agg(
        F.slice(F.array_sort(F.collect_set("dst")), 1, max_neighbors).alias("nbs")
    )
    cand = (
        nbrs.select(
            F.explode(
                _ordered_pairs(
                    "nbs", lambda x, y: F.struct(x.alias("a"), y.alias("b"))
                )
            ).alias("w")
        )
        .groupBy(F.col("w.a").alias("node_a"), F.col("w.b").alias("node_b"))
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
    )
    nonadj = (
        cand.join(
            ed.select(
                F.col("src").alias("node_a"),
                F.col("dst").alias("node_b"),
                F.lit(1).alias("__adj"),
            ),
            ["node_a", "node_b"],
            "left",
        )
        .filter(F.col("__adj").isNull())
        .drop("__adj")
    )
    score = F.col("common_neighbors").cast("double") / (
        F.col("__da") + F.col("__db") - F.col("common_neighbors")
    ).cast("double")
    return (
        nonadj.join(
            deg.select(F.col("node").alias("node_a"), F.col("deg").alias("__da")),
            "node_a",
        )
        .join(
            deg.select(F.col("node").alias("node_b"), F.col("deg").alias("__db")),
            "node_b",
        )
        .select(
            "node_a",
            "node_b",
            F.col("common_neighbors").cast("long").alias("common_neighbors"),
            F.round(score + 1e-12, 6).alias("jaccard_score"),
        )
        .orderBy(F.col("jaccard_score").desc(), "node_a", "node_b")
        .limit(k)
    )


def copurchase_edges(
    spark: SparkSession,
    sf_dir: str,
    min_weight: int = 1,
    max_basket: int = 64,
) -> DataFrame:
    """Co-purchase edges over ``lineitem``: parts a < b linked with
    weight = number of orders containing both (see edges_from_baskets).
    At TPC-H shapes (≤ a dozen lines per order) the basket cap never
    binds; it exists for the open-world case."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    return edges_from_baskets(li, "ok", "pk", min_weight, max_basket)


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Degree distribution of an undirected (src, dst) edge frame:
    (degree, n_nodes). Output is O(max_degree) rows at any graph size;
    both aggregations partial-aggregate map-side."""
    ends = edges.select(F.col("src").alias("node")).unionAll(
        edges.select(F.col("dst").alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Global triangle census over an undirected simple graph (src < dst
    per input row): one row — n_nodes, n_edges, n_wedges, n_triangles,
    global clustering coefficient.

    Degree-ordered orientation: edge (u,v) points from the (degree, id)-
    smaller endpoint to the larger. The orientation is acyclic and every
    triangle has exactly one vertex with two outgoing triangle edges, so
    counting (u→v, u→w, v→w) with v before w in the same order counts
    each triangle once. Out-degrees under this orientation are O(sqrt(m)),
    which bounds total wedge fan-out at sum(outdeg²) — the hub-proof
    shape; the naive id-orientation puts all of a hub's wedges on the hub.

    Plan: the edge frame is localCheckpoint-ed once (it feeds four
    subtrees — degrees, orientation, edge count, closure side — and Spark
    does not share common subplans across DataFrame reuse), wedges are
    generated by PER-ROW pair expansion over each node's sorted out-
    neighbor ARRAY (one groupBy(u) of the m oriented edges; no self-join
    shuffle; fan-out bounded by the sqrt(m) out-degree cap), and the
    closure check is an equi-join of the wedge stream against the oriented
    edges on (v, w) — deliberately unhinted so AQE broadcasts the edge
    side when it fits and falls back to shuffle when the graph outgrows
    memory (the dedup anti-join discipline).
    """
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    deg = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)  # O(V) rows, read by two subtrees
    )
    # attach degrees to both endpoints, then orient
    withdeg = (
        e.join(deg.withColumnRenamed("node", "src").withColumnRenamed("deg", "ds"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "dd"), "dst")
    )
    src_first = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    o = withdeg.select(
        F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(src_first, F.col("dd")).otherwise(F.col("ds")).alias("dv"),
    ).localCheckpoint(eager=True)
    # out-neighbors of u sorted by the SAME (deg, id) total order; pairs
    # (v, w) with v before w in that order, expanded inside codegen
    nbrs = o.groupBy("u").agg(
        F.array_sort(F.collect_list(F.struct("dv", "v"))).alias("ns")
    )
    wedges = nbrs.select(
        F.explode(
            _ordered_pairs(
                "ns",
                lambda x, y: F.struct(
                    x.getField("v").alias("v"), y.getField("v").alias("w")
                ),
            )
        ).alias("p")
    ).select(F.col("p.v").alias("v"), F.col("p.w").alias("w"))
    tri = wedges.join(
        o.select(F.col("u").alias("v"), F.col("v").alias("w")), ["v", "w"]
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    counts = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2).cast("long").alias("n_wedges"),
    )
    nedges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        counts.crossJoin(nedges)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                3.0 * F.col("n_triangles") / F.col("n_wedges") + F.lit(_EPS), 6
            ).alias("clustering_coef"),
        )
    )


def modularity(edges: DataFrame, assignment: DataFrame) -> DataFrame:
    """Newman modularity Q of a node partition over an undirected simple
    graph: Q = Σ_c [ m_c/m − (d_c/2m)² ] — how much denser communities
    are than a degree-preserving random rewiring (Q≈0: no structure;
    Q→1: strong communities). The standard objective for judging a
    clustering of a similarity / co-occurrence graph.

    ``assignment``: (node, group_id) — e.g. dup_groups output. Nodes
    without an assignment form singleton communities implicitly (they
    contribute no intra-edges and their degree term is counted via the
    coalesced node id), so partial clusterings score correctly.

    One row out. Three keyed aggregations, all map-side combinable:
    intra-community edge counts (join both endpoints to the assignment),
    per-community degree sums, and the global reduce. No iteration — Q
    EVALUATES a partition; producing one is dup_groups' job.
    """
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    asg = assignment.select(
        F.col(assignment.columns[0]).alias("node"),
        F.col(assignment.columns[1]).alias("g"),
    ).localCheckpoint(eager=True)
    m = e.count()
    # one label row per DISTINCT node (joining a per-edge frame would fan
    # out); unassigned nodes become their own singleton community
    # (negative key space so real group ids can't collide)
    lab = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(asg, "node", "left")
        .select(
            F.col("node"),
            F.coalesce(F.col("g"), -F.col("node") - 1).alias("g"),
        )
        .localCheckpoint(eager=True)
    )
    labeled = (
        e.join(lab.withColumnRenamed("node", "src").withColumnRenamed("g", "ga"), "src")
        .join(lab.withColumnRenamed("node", "dst").withColumnRenamed("g", "gb"), "dst")
    )
    intra = (
        labeled.filter(F.col("ga") == F.col("gb"))
        .groupBy(F.col("ga").alias("g"))
        .agg(F.count(F.lit(1)).alias("m_c"))
    )
    degs = (
        labeled.select(F.col("src").alias("node"), F.col("ga").alias("g"))
        .unionAll(labeled.select(F.col("dst").alias("node"), F.col("gb").alias("g")))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("d_c"))
    )
    per_c = degs.join(intra, "g", "left").select(
        "g",
        F.coalesce(F.col("m_c"), F.lit(0)).alias("m_c"),
        "d_c",
    )
    return per_c.agg(
        F.lit(m).cast("long").alias("m_edges"),
        F.count(F.lit(1)).alias("n_communities"),
        F.round(
            F.sum(
                F.col("m_c") / F.lit(float(m))
                - F.pow(F.col("d_c") / F.lit(2.0 * m), F.lit(2.0))
            )
            + F.lit(1e-9),
            6,
        ).alias("q_modularity"),
    )


def hop_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 3,
) -> DataFrame:
    """Multi-source BFS over the undirected graph: (node, hops) = minimum
    hop count from ANY source node, bounded at ``max_hops`` — the
    neighborhood-expansion primitive (seed-set reach, contamination
    radius, "how far does influence travel from these hubs").

    Classic frontier iteration: per hop, join the frontier to the
    checkpointed adjacency, dedupe the neighbor set, anti-join the
    visited set, tag with the hop number. All joins are node-keyed equi-
    joins; frontier and visited frames are localCheckpoint-ed per hop so
    lineage stays O(1). Integer-only state — no cross-engine float
    concerns at all. Cost per hop is O(edges incident to the frontier) +
    one anti-join against visited (O(V) at worst) — the standard
    distributed BFS trade; ``max_hops`` bounds the loop, and on a
    small-world graph the frontier saturates in ~3 hops anyway.

    ``sources``: a single-column frame of node ids (column ``node``).
    Sources absent from the edge set still appear at hops 0 (reach is
    defined for any seed).
    """
    sym = (
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint(eager=True)
    )
    dist = (
        sources.select("node")
        .distinct()  # duplicate seed rows must not duplicate hop-0 output
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym.withColumnRenamed("src", "node"), "node")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint(eager=True)
        )
        dist = dist.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return dist


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """PageRank over the undirected graph (each edge walked both ways), a
    fixed number of iterations: (node, pr).

    With ``seeds`` (single-column frame ``node``): PERSONALIZED PageRank —
    the teleport mass returns only to the seed set instead of spreading
    uniformly, so ranks measure proximity to the seeds (the "quality
    radiates from trusted hubs" signal: TrustRank-style host scoring,
    seed-anchored recommendations). Init mass and per-iteration teleport
    both concentrate on seeds; everything else about the loop — plan
    shape, checkpointing, in-loop quantization, the chained-CTE oracle —
    is unchanged, with the teleport term becoming a per-node literal
    joined from the broadcast seed frame.

    Per iteration: contributions = adjacency ⋈ ranks on src (adjacency is
    checkpointed once, hash-partitioned by src; ranks arrive partitioned
    the same way, so AQE plans the join without re-shuffling the big
    side), then one dst-keyed sum with map-side combine. Rank frame is
    localCheckpoint-ed per round — lineage does not grow with iterations.

    In-loop quantization: every rank is rounded to 10 decimals (with the
    shared boundary nudge) after each update, so the next iterate depends
    only on the quantized values, not on summation order — bit-identical
    across partitionings and engines, hence the exact chained-CTE DuckDB
    oracle. Symmetrized edges mean no dangling nodes: every node in the
    frame has out-degree ≥ 1, so no rank mass leaks.

    Runs its loop under ``_loop_shuffle``, which pins session-wide SQL
    confs (shuffle width, AQE) for the duration — see that docstring for
    the concurrency caveat when sharing a session across threads.
    """
    # checkpoint the symmetrized edges once: they feed the degree frame and
    # the adjacency build, and the degree frame in turn feeds the rank
    # init AND the node count — without the checkpoints the upstream edge
    # derivation would re-execute once per consumer (Spark shares no
    # common subplans across DataFrame reuse)
    sym = (
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint(eager=True)
    )
    m = sym.count()  # sizes the loop's shuffle width (one cheap job on
    # the checkpointed RDD); also the contribution-row volume per round
    spark = edges.sparkSession
    with _loop_shuffle(spark, m):
        return _pagerank_loop(spark, sym, m, iterations, damping, seeds)


def _pagerank_loop(
    spark: SparkSession,
    sym: DataFrame,
    m: int,
    iterations: int,
    damping: float,
    seeds: DataFrame | None,
) -> DataFrame:
    """The loop body of ``pagerank``, executed under ``_loop_shuffle``.
    The returned frame is eagerly checkpointed INSIDE the window so every
    job the loop submits runs at the data-derived width; the caller's
    downstream plan consumes a materialized RDD."""
    outdeg = (
        sym.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    adj = (
        sym.join(outdeg, "src")
        .repartition(F.col("src"))
        .localCheckpoint(eager=True)
    )
    n = outdeg.count()  # one small driver scalar, fixed per run
    nodes = outdeg.select(F.col("src").alias("node"))
    if seeds is None:
        init = F.round(F.lit(1.0) / n + F.lit(_EPS), 10)
        base = nodes.select("node", init.alias("pr"))
        tele_frame = None
    else:
        # normalize by seeds PRESENT in the graph: a seed with no edges
        # can never receive or emit rank, and dividing by the raw seed
        # count would silently delete its share of the mass (rank would
        # sum to (s-absent)/s, not 1)
        seed_set = (
            seeds.select("node")
            .distinct()
            .join(nodes, "node")
            .localCheckpoint(eager=True)
        )
        s = seed_set.count()
        marked = nodes.join(
            F.broadcast(seed_set.withColumn("__seed", F.lit(1))), "node", "left"
        )
        base = marked.select(
            "node",
            F.round(
                F.when(F.col("__seed").isNotNull(), F.lit(1.0) / s).otherwise(
                    F.lit(0.0)
                )
                + F.lit(_EPS),
                10,
            ).alias("pr"),
        )
        # per-node teleport column: (1-d)/|seeds| on seeds, 0 elsewhere
        tele_frame = marked.select(
            "node",
            F.when(
                F.col("__seed").isNotNull(), F.lit(1.0 - damping) / s
            ).otherwise(F.lit(0.0)).alias("__tele"),
        ).localCheckpoint(eager=True)
    ranks = base.localCheckpoint(eager=True)
    teleport = F.lit(1.0 - damping) / n
    # Checkpoint CADENCE: every iteration must quantize (that is what
    # makes the fixpoint engine- and partitioning-independent), but it
    # does NOT need to materialize — an eager localCheckpoint per round
    # costs a full job submission whose fixed scheduling overhead
    # dominates when the rank frame is small relative to cluster
    # parallelism. Chaining a few rounds per checkpoint keeps lineage
    # bounded at O(cadence) joins while cutting the job count ~3×; the
    # values are bit-identical either way because each round's input is
    # the quantized expression, not a floating accumulation.
    _CADENCE = 3
    # Rank frame = node universe: when countably small (n is already on
    # the driver), broadcast it so the per-round join becomes a hash
    # probe of the pre-partitioned adjacency — no shuffle, no per-round
    # sort of the edge-sized side. Interleaved r9 A/B at sf0.1 (2.39 M
    # symmetrized edges, identical rank hashes): loop 5.1/4.8 s shuffle
    # vs 3.8/3.4 s broadcast. Above the bound the shuffle path stands.
    bcast = n <= _LOOP_BCAST_MAX_NODES
    for it in range(iterations):
        r = ranks.withColumnRenamed("node", "src")
        contribs = adj.join(
            F.broadcast(r) if bcast else r, "src"
        ).select(F.col("dst").alias("node"), (F.col("pr") / F.col("deg")).alias("c"))
        summed = contribs.groupBy("node").agg(F.sum("c").alias("__s"))
        if tele_frame is None:
            ranks = summed.select(
                "node",
                F.round(
                    teleport + F.lit(damping) * F.col("__s") + F.lit(_EPS), 10
                ).alias("pr"),
            )
        else:
            # left join from the FULL node set: a node whose in-neighbors
            # all have rank 0 this round still keeps its teleport share
            ranks = tele_frame.join(summed, "node", "left").select(
                "node",
                F.round(
                    F.col("__tele")
                    + F.lit(damping) * F.coalesce(F.col("__s"), F.lit(0.0))
                    + F.lit(_EPS),
                    10,
                ).alias("pr"),
            )
        if (it + 1) % _CADENCE == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    # materialize the tail segment inside the _loop_shuffle window (the
    # caller's downstream plan then starts from a checkpointed RDD under
    # the session's own confs)
    return ranks.localCheckpoint(eager=True)


def kcore(
    edges: DataFrame,
    k: int = 3,
    max_rounds: int = 12,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly delete nodes
    with degree < k (undirected, each edge walked both ways) until stable
    or ``max_rounds`` peels — (node, deg) for the surviving core, deg the
    node's degree INSIDE the core.

    Why a curation pipeline wants it: the k-core isolates densely
    interlinked regions — on a web/link graph the spam farms and mutual-
    promotion rings sit in high cores while organic pages shed early
    (degree alone cannot see this: a hub with k spokes has high degree
    and no core). The peel is the standard O(rounds · E) shape.

    Semantics are pinned to ``max_rounds`` peels so the chained-CTE SQL
    unrolling is exact: the loop breaks early when a round removes
    nothing (the fixpoint equals every longer unroll), and a graph still
    shrinking at the cap simply reports the ``max_rounds``-peel state on
    BOTH engines. Per round: one degree aggregation + two semi-joins,
    edge frame localCheckpoint-ed (lazy, materialized by the round's
    count action) so lineage stays O(1); node counts are monotone
    decreasing, so count-stability IS the fixpoint test.
    """
    sym = (
        edges.select("src", "dst")
        .unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .localCheckpoint(eager=False)
    )
    prev_nodes: int | None = None
    for _ in range(max_rounds):
        deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select(F.col("src").alias("node"))
        keep = keep.localCheckpoint(eager=False)
        n = keep.count()
        if prev_nodes is not None and n == prev_nodes:
            break
        prev_nodes = n
        sym = (
            sym.join(keep.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
    return (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .filter(F.col("deg") >= k)
    )


def hits_bipartite(
    items: DataFrame,
    basket_col: str = "ok",
    item_col: str = "pk",
    iterations: int = 8,
    max_basket: int = 64,
) -> DataFrame:
    """HITS over the bipartite basket→item graph: hubs are baskets
    (orders), authorities are items (parts) — "authority parts sit in
    many strong baskets; strong baskets hold many authority parts", the
    Kleinberg mutual-reinforcement fixpoint. On the PROJECTED co-purchase
    graph HITS degenerates (undirected ⇒ hubs ≡ authorities); the
    bipartite form is the one with information in it.

    Per iteration: authority = edge ⋈ hub → item-keyed sum, L1-normalized
    by `crossJoin(broadcast(agg(sum)))`; then the hub update as a PLAIN
    quantized sum — no hub normalization. That is exact, not an
    approximation: each auth step L1-normalizes, and normalization
    divides out any positive scaling of its input, so the auth sequence
    is identical (in exact arithmetic) to the both-normalized textbook
    form — hub normalization only ever existed for numeric bounding,
    and raw hub sums are already bounded by max_basket · Σauth =
    max_basket, safely inside 10-dp quantization range. Dropping it
    removes one global total + broadcast + crossJoin per iteration —
    the hub half-step becomes pagerank-shaped (the score frame is
    referenced ONCE). One eager localCheckpoint per full iteration (on
    hubs) cuts the lineage; the auth total's agg subtree appears twice
    in the logical plan, but the physical planner's ReuseExchange
    dedupes the identical exchange, so each half-step executes once —
    and, unlike a whole-frame window, the normalization never funnels
    the O(items) frame through a single partition: the item/URL
    universe grows with the graph, so a global window here is a scale
    cliff. Every value is quantized to 10 decimals after each update so
    the iterate is independent of summation order — the chained-CTE SQL
    unrolling is exact, the same contract as pagerank. L1 (not L2)
    normalization keeps the oracle sqrt-free; rankings are identical
    under any positive scaling.

    Returns (item, auth) for every item that SURVIVES the per-basket cap:
    baskets are truncated to their `max_basket` lexically-first items, so
    items sliced off every basket they appear in are absent from the
    output entirely (documented fan-out bound, not a bug).

    Runs its loop under ``_loop_shuffle``, which pins session-wide SQL
    confs (shuffle width, AQE) for the duration — see that docstring for
    the concurrency caveat when sharing a session across threads."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    edges = (
        items.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .groupBy("__b")
        .agg(F.slice(F.array_sort(F.collect_set("__i")), 1, max_basket).alias("__arr"))
        .select("__b", F.explode("__arr").alias("__i"))
        .localCheckpoint(eager=True)
    )
    ne = edges.count()  # sizes the loop's shuffle width (cheap job on
    # the checkpointed RDD; also the per-half-step join volume)
    spark = items.sparkSession
    # 100k rows/task, not the 300k default: HITS's half-steps are two
    # skinny (key, double) join+agg passes — the r8 A/B measured 100k at
    # −33% wall (3.24 vs 4.82 s sf0.1) and −20% at the 100× replica
    # (129-138 vs 162-166 s cold), order-independent; pagerank's wider
    # adjacency join prefers the default (see _loop_shuffle docstring).
    with _loop_shuffle(spark, ne, rows_per_task=100_000):
        return _hits_loop(spark, items, edges, item_col, iterations, ne)


def _hits_loop(
    spark: SparkSession,
    items: DataFrame,
    edges: DataFrame,
    item_col: str,
    iterations: int,
    ne: int,
) -> DataFrame:
    """The loop body of ``hits_bipartite`` under ``_loop_shuffle`` — the
    same width discipline as ``_pagerank_loop``; the returned auth frame
    is checkpointed inside the window."""
    baskets = edges.select("__b").distinct()
    nb = baskets.count()
    if nb == 0:
        from pyspark.sql.types import DoubleType, StructField, StructType

        empty_schema = StructType(
            [
                StructField("item", items.schema[item_col].dataType),
                StructField("auth", DoubleType()),
            ]
        )
        return items.sparkSession.createDataFrame([], empty_schema)
    hubs = baskets.select(
        "__b", F.round(F.lit(1.0) / nb + F.lit(_EPS), 10).alias("__h")
    ).localCheckpoint(eager=True)

    def _l1(raw: DataFrame, key: str, out: str) -> DataFrame:
        # L1-normalize WITHOUT materializing the half-step and WITHOUT a
        # whole-frame window: the scalar total rides as a lazy
        # crossJoin(broadcast(agg)). The raw subtree appears twice in the
        # logical plan (total branch + value branch), but the physical
        # planner's ReuseExchange dedupes the identical agg exchange, so
        # the half-step executes ONCE; nothing funnels the O(items) frame
        # through a single partition.
        tot = raw.agg(F.sum("__raw").alias("__tot"))
        return raw.crossJoin(F.broadcast(tot)).select(
            key,
            F.round(F.col("__raw") / F.col("__tot") + F.lit(_EPS), 10).alias(out),
        )

    # Both half-step joins carry a bounded score frame against the
    # edge-sized side: broadcast it when countably small so the edges are
    # never shuffled inside the loop (guide §3.1). Hubs gate on the exact
    # basket count nb; the lazy auth frame gates on the edge count ne —
    # a free conservative upper bound on the item universe (every item
    # appears on ≥1 edge), so no extra counting job. Interleaved r9 A/B
    # at sf0.1 (identical auth hashes): loop 5.5/6.0 s shuffle vs
    # 4.5/3.7 s broadcast. Above the bound the shuffle path stands.
    b_hub = nb <= _LOOP_BCAST_MAX_NODES
    b_auth = ne <= _LOOP_BCAST_MAX_NODES
    auth = None
    for it in range(iterations):
        araw = (
            edges.join(F.broadcast(hubs) if b_hub else hubs, "__b")
            .groupBy("__i")
            .agg(F.sum("__h").alias("__raw"))
        )
        auth = _l1(araw, "__i", "__a")
        if it + 1 == iterations:
            break  # the final hub update cannot affect the returned auth
        # hub update: quantized raw sum, UN-normalized (see docstring —
        # the next auth normalization divides any scaling out, so this
        # is exact, and it keeps the hub half-step single-reference).
        # ONE eager checkpoint per iteration: cuts the doubled lineage so
        # plan size stays O(1) per round (the job also pipelines both
        # half-steps' exchanges — the job-count discipline pagerank uses)
        hubs = (
            edges.join(F.broadcast(auth) if b_auth else auth, "__i")
            .groupBy("__b")
            .agg(F.round(F.sum("__a") + F.lit(_EPS), 10).alias("__h"))
            .localCheckpoint(eager=True)
        )
    return auth.select(
        F.col("__i").alias("item"), F.col("__a").alias("auth")
    ).localCheckpoint(eager=True)


def label_propagation(edges: DataFrame, iterations: int = 5) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan, Albert &
    Kumara 2007 — public) over the undirected graph: every node starts
    as its own label; each round it adopts its neighbors' MAJORITY
    label, ties broken by the smallest label id. Returns
    (node, community) after a FIXED ``iterations`` rounds — the fixed
    budget pins semantics exactly like pagerank's (free-running LPA can
    oscillate on bipartite-ish structure; a pinned round count makes the
    result a pure function of the graph on any engine).

    The near-linear community baseline that complements the structural
    outputs (components = connectivity, k-core = density, modularity =
    a partition SCORE): LPA actually PRODUCES the partition, with no
    resolution parameter and no floats — every compared value is an
    integer count or label, so cross-engine parity is structural, not
    quantized.

    Plan shape per round: one src-keyed join of the symmetrized edges
    against the label frame, one (dst, label) count with map-side
    combine, one per-node argmax as a groupBy ``min(struct(-count,
    label))`` — map-side combinable, NO window over the node universe.
    Runs under ``_loop_shuffle`` (see its docstring for the conf
    caveat) with one eager checkpoint per round, the pagerank lineage
    discipline. A node's own label does not vote (pure neighbor
    majority, the textbook form); isolated nodes never appear in the
    edge frame and are out of scope, as in pagerank."""
    sym = (
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint(eager=True)
    )
    m = sym.count()
    spark = edges.sparkSession
    with _loop_shuffle(spark, m):
        labels = (
            sym.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("lbl", F.col("node"))
            .localCheckpoint(eager=True)
        )
        # The label frame is the node universe: when it is small enough
        # to ship (counted once — it never grows), broadcasting it turns
        # every round's join into a map-side hash probe and the
        # edge-sized sym frame is never shuffled again. Interleaved r9
        # A/B at sf0.1 (2.39 M symmetrized edges, 3-variant loop, same
        # result hash): broadcast 4.6/3.8 s vs shuffle-join 16.6/6.9 s;
        # pre-partitioning sym by src measured NO win (13.8/16.1 s), so
        # the fallback keeps the original shape.
        bcast = labels.count() <= _LOOP_BCAST_MAX_NODES
        for _ in range(iterations):
            lhs = F.broadcast(labels) if bcast else labels
            votes = (
                sym.join(lhs, sym["src"] == labels["node"])
                .groupBy(F.col("dst").alias("__n"), "lbl")
                .agg(F.count(F.lit(1)).alias("__c"))
            )
            labels = (
                votes.groupBy(F.col("__n").alias("node"))
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("__c")).alias("nc"), F.col("lbl").alias("l")
                        )
                    ).alias("__m")
                )
                .select("node", F.col("__m.l").alias("lbl"))
                .localCheckpoint(eager=True)
            )
        return labels.select("node", F.col("lbl").alias("community"))
