"""Graph operators [EXT]: PageRank and triangle counting over a top-k
sparsified supplier co-occurrence graph.

The reference pipeline (``PipelineProcessor.scala:13-42``) moves flat
records; these are the graph-shaped analyses a data platform grows the
day its records become *relations between entities* (supplier networks,
doc-link graphs, user-interaction graphs). Both operators follow the
repo's iterative-algorithm discipline established by
``similarity.kmeans_clusters``: deterministic arithmetic end-to-end
(decimal-cast order-independent sums, ties broken on ids) so even an
iterative fixpoint-style computation is held to a full value-hash DuckDB
oracle via chained CTEs — not a rows-only check.

Graph construction (shared): raw edges connect suppliers that co-appear
in the same order (weight = number of co-orders), then each node keeps
only its ``k`` = 8 STRONGEST out-edges (ties to the lower neighbor id).
The top-k sparsification is the scale-critical step: the raw
co-occurrence graph densifies toward complete as the corpus grows (at
sf0.1 it is already ~90% of all supplier pairs), which would make wedge
enumeration quadratic in degree — capping degree at ``k`` bounds
per-node wedge work at O(k^2) and total edges at O(N*k) at ANY corpus
size. This is the standard kNN-graph construction used for
co-occurrence/similarity graphs in practice. The per-order pair
expansion feeding it is bounded by lines-per-order (~7), so raw edge
volume grows linearly with lineitem volume — no all-pairs join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_kafka_airflow_pipeline_spark.operators.base import QueryFn, table

TOPK_NEIGHBORS = 8


def _supplier_topk_edges(spark: SparkSession, sf_dir: str,
                         k: int = TOPK_NEIGHBORS) -> DataFrame:
    """Directed top-k co-occurrence edges: per-order supplier SETS
    (one ``collect_set`` shuffle keyed on l_orderkey — the set dedups
    (order, supplier) in the same aggregate, partial-merged map-side),
    ordered co-occurrence pairs generated per order by a higher-order
    flatten/transform over the bounded (<= ~7-element) set, weights
    counted, then a per-src rank window keeps the k strongest
    neighbors. r18: this replaces the r1-r17 distinct + self-join-on-
    order-key shape — the per-basket HOF emits the identical pair
    multiset (a row per order where src and dst co-appear) while the
    plan drops from 5 Exchanges + a join to 3 Exchanges and no join
    (the separate distinct shuffle and the join's exchange both fold
    into the one collect_set aggregate; exceptAll both ways verified
    the edge set identical, interleaved A/B at sf0.1 a wash — the win
    is the removed lineitem-sized exchange, which is what matters at
    scale; per-order fan-out stays bounded by lines-per-order).
    Returns src/dst/w with w cast double (the PageRank contract
    divides by it)."""
    sets = (table(spark, sf_dir, "lineitem")
            .select(F.col("l_orderkey").alias("ok"),
                    F.col("l_suppkey").alias("sk"))
            .groupBy("ok").agg(F.collect_set("sk").alias("ss")))
    raw = (sets.select(F.explode(F.expr(
               "flatten(transform(ss, x -> transform(filter(ss, "
               "y -> y != x), y -> struct(x AS src, y AS dst))))"))
           .alias("p"))
           .select("p.src", "p.dst")
           .groupBy("src", "dst")
           .agg(F.count(F.lit(1)).cast("double").alias("w")))
    rnk = Window.partitionBy("src").orderBy(F.col("w").desc(), F.col("dst"))
    return (raw.withColumn("rn", F.row_number().over(rnk))
            .filter(F.col("rn") <= k)
            .select("src", "dst", "w"))


_EDGES_SQL = f"""
os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
rawe AS (
  SELECT a.sk AS src, b.sk AS dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM os a JOIN os b ON a.ok = b.ok AND a.sk != b.sk
  GROUP BY a.sk, b.sk
),
edges AS (
  SELECT src, dst, w FROM (
    SELECT src, dst, w,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY w DESC, dst) AS rn
    FROM rawe)
  WHERE rn <= {TOPK_NEIGHBORS}
)"""


def pagerank_supplier_rank(spark: SparkSession, sf_dir: str,
                           iters: int = 3, damping: float = 0.85) -> DataFrame:
    """Weighted PageRank over the top-k graph, ``iters`` fixed power
    iterations — the classic iterative distributed graph algorithm,
    expressed as a DataFrame loop the same way GraphX/Pregel lowers it:
    join ranks to edges, scale by edge weight over source out-weight,
    aggregate per target.

    Determinism (the ``kmeans_clusters`` discipline, so a DuckDB
    chained-CTE oracle can value-hash the result): each edge's
    contribution ``rank * w / outw`` is a fixed left-to-right double
    expression in both engines, per-target accumulation runs as an
    order-independent ``decimal(30,15)`` sum, and the damping update
    ``0.15/N + 0.85 * sum`` is a fixed double expression. Every rank
    therefore lands bit-identically regardless of partitioning.
    Dangling nodes (in the top-k graph a node always has out-edges, but
    a node can receive none) keep the damping floor only — same rule
    both engines. N counts nodes with out-edges (= all suppliers).

    Scale: per iteration = one join of the (static, O(N*k)-sized) edge
    relation to the current rank vector on ``src`` + one aggregation on
    ``dst`` — both hash-partitioned on supplier key, so a
    pre-partitioned edge table makes each iteration a single co-located
    shuffle. The edge relation is materialized ONCE before the loop
    with an eager ``localCheckpoint`` (the ``dedup_clusters``
    discipline): lazy lineage would re-run the lineitem self-join per
    iteration, and lineage truncation is what keeps iterative plans
    from growing per round; localCheckpoint pins no CacheManager entry,
    so nothing leaks into a long-lived session."""
    edges = _supplier_topk_edges(spark, sf_dir).localCheckpoint(eager=True)
    ranks = pagerank_over_edges(edges, iters=iters, damping=damping)
    return ranks.select(F.col("sk").alias("s_suppkey"),
                        F.round("rank", 8).alias("pagerank"))


def pagerank_over_edges(edges: DataFrame, iters: int = 3,
                        damping: float = 0.85) -> DataFrame:
    """The PageRank loop over an arbitrary (src, dst, w) edge frame —
    factored out so property tests can drive it with random graphs
    against an independent dense numpy reference. Returns (sk, rank)."""
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    n = outw.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ranks = (outw.crossJoin(F.broadcast(n))
             .select(F.col("src").alias("sk"),
                     (F.lit(1.0) / F.col("n")).alias("rank")))
    for _ in range(iters):
        contrib = (edges.join(ranks, edges.src == ranks.sk)
                   .join(outw, "src")
                   .select(F.col("dst"),
                           (F.col("rank") * F.col("w")
                            / F.col("outw")).alias("c")))
        recv = (contrib.groupBy("dst")
                .agg(F.sum(F.col("c").cast("decimal(30,15)"))
                     .cast("double").alias("s")))
        # left join back to the full node set: a node nobody links to
        # this round keeps only the damping floor (sum coalesced to 0)
        ranks = (outw.select(F.col("src").alias("sk"))
                 .join(recv, F.col("sk") == recv.dst, "left")
                 .crossJoin(F.broadcast(n))
                 .select("sk",
                         (F.lit(1.0 - damping) / F.col("n")
                          + F.lit(damping)
                          * F.coalesce("s", F.lit(0.0))).alias("rank")))
    return ranks


_PR_ITER = """
r{n} AS (
  SELECT nodes.sk,
         0.15 / (SELECT n FROM nn)
         + 0.85 * COALESCE(recv.s, 0.0) AS rank
  FROM (SELECT src AS sk FROM outw) nodes
  LEFT JOIN (
    SELECT e.dst AS sk,
           CAST(SUM(CAST(r.rank * e.w / d.outw AS DECIMAL(30,15))) AS DOUBLE)
             AS s
    FROM edges e
    JOIN r{p} r ON r.sk = e.src
    JOIN outw d ON d.src = e.src
    GROUP BY e.dst
  ) recv USING (sk)
)"""

PAGERANK_SQL = f"""
WITH {_EDGES_SQL},
outw AS (SELECT src, SUM(w) AS outw FROM edges GROUP BY src),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM outw),
r0 AS (SELECT src AS sk, 1.0 / (SELECT n FROM nn) AS rank FROM outw),
{_PR_ITER.format(n=1, p=0)},
{_PR_ITER.format(n=2, p=1)},
{_PR_ITER.format(n=3, p=2)}
SELECT sk AS s_suppkey, round(rank, 8) AS pagerank FROM r3
"""


def triangle_count_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the UNDIRECTED top-k graph (an edge exists
    if either endpoint kept the other in its top-k) using DEGREE
    ORIENTATION — the standard trick that makes distributed triangle
    counting tractable: orient every undirected edge from the
    lower-degree endpoint to the higher (ties to the lower id), so each
    triangle is counted exactly once at its unique 2-out-degree apex
    and the wedge join runs over out-neighborhoods that orientation
    keeps small even around hubs. With the top-k cap, per-node wedge
    work is O(k^2) and the whole count is two hash joins — no all-pairs
    step at any corpus size.

    Output: one row — nodes, undirected edge count, triangle count,
    and the global clustering coefficient 3*tri/wedges rounded to 8."""
    topk = _supplier_topk_edges(spark, sf_dir).select("src", "dst")
    # symmetrize (union of directions), then distinct undirected pairs
    # materialized once (localCheckpoint, see pagerank): the undirected
    # edge list is consumed by the degree agg AND the orientation join,
    # and `oriented` is referenced three times in the wedge closure —
    # lazy lineage would re-run the co-count shuffle for each use
    und = (topk.unionByName(topk.select(F.col("dst").alias("src"),
                                        F.col("src").alias("dst")))
           .distinct().localCheckpoint(eager=True))
    return triangle_count_over_undirected(und)


def triangle_count_over_undirected(und: DataFrame) -> DataFrame:
    """The degree-oriented triangle kernel over an arbitrary SYMMETRIC
    distinct (src, dst) edge frame — factored out so property tests
    can drive it with random graphs against a brute-force itertools
    reference."""
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    d1 = deg.withColumnRenamed("src", "u").withColumnRenamed("deg", "du")
    d2 = deg.withColumnRenamed("src", "v").withColumnRenamed("deg", "dv")
    oriented = (und.withColumnRenamed("src", "u").withColumnRenamed("dst", "v")
                .join(d1, "u").join(d2, "v")
                .filter((F.col("du") < F.col("dv"))
                        | ((F.col("du") == F.col("dv"))
                           & (F.col("u") < F.col("v"))))
                .select("u", "v"))
    e1 = oriented.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = oriented.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = e1.join(e2, "a").filter(F.col("b") < F.col("c"))
    closing = oriented.select(F.col("u").alias("b"), F.col("v").alias("c")) \
        .unionByName(oriented.select(F.col("v").alias("b"),
                                     F.col("u").alias("c")))
    tri = wedges.join(closing, ["b", "c"]).agg(
        F.count(F.lit(1)).alias("n_triangles"))
    # integer arithmetic only (div, not /): a per-row double division
    # summed across partitions would be accumulation-order-dependent
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.expr("sum(deg) div 2").alias("n_edges"),
        F.expr("sum(deg * (deg - 1) div 2)").alias("n_wedges"))
    return (stats.crossJoin(F.broadcast(tri))
            .select("n_nodes", "n_edges", "n_triangles",
                    F.round(F.lit(3.0) * F.col("n_triangles")
                            / F.col("n_wedges"), 8)
                    .alias("clustering_coeff")))


TRIANGLE_SQL = f"""
WITH {_EDGES_SQL},
und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges
    UNION ALL SELECT dst AS src, src AS dst FROM edges)
),
deg AS (SELECT src, COUNT(*) AS deg FROM und GROUP BY src),
oriented AS (
  SELECT e.src AS u, e.dst AS v
  FROM und e
  JOIN deg d1 ON d1.src = e.src
  JOIN deg d2 ON d2.src = e.dst
  WHERE d1.deg < d2.deg OR (d1.deg = d2.deg AND e.src < e.dst)
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM oriented e1 JOIN oriented e2 ON e1.u = e2.u AND e1.v < e2.v) w
  JOIN (SELECT u AS b, v AS c FROM oriented
        UNION ALL SELECT v AS b, u AS c FROM oriented) cl
    USING (b, c)
),
stats AS (
  SELECT COUNT(*) AS n_nodes,
         CAST(SUM(deg) AS BIGINT) // 2 AS n_edges,
         CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
  FROM deg
)
SELECT n_nodes, n_edges, n_triangles,
       round(3.0 * n_triangles / n_wedges, 8) AS clustering_coeff
FROM stats CROSS JOIN tri
"""


BFS_MAX_HOPS = 4


def supplier_bfs_hops(spark: SparkSession, sf_dir: str,
                      max_hops: int = BFS_MAX_HOPS) -> DataFrame:
    """Multi-hop reachability [EXT]: breadth-first search from the
    lowest-keyed supplier over the top-k co-occurrence graph, returning
    every supplier reachable within ``max_hops`` hops with its MINIMUM
    hop distance — the "supply-network blast radius" question (which
    partners are ≤ n relationships away?).

    Spark-first shape: FRONTIER ITERATION, the way Pregel/GraphX lowers
    BFS. Each hop is one hash join of the (static, O(N*k)) edge
    relation to the current frontier on ``src`` plus one left-anti join
    against the visited set on the supplier key — both partition on the
    supplier key, and the frontier/visited frames are bounded by the
    NODE count (every node appears at most once), never by path count.
    The DuckDB recursive-CTE oracle, by contrast, enumerates every
    path of length ≤ max_hops (up to k^max_hops rows): correct as a
    small-scale oracle, exponentially wrong as a plan — the point of
    the frontier formulation. Each frontier is localCheckpoint-ed
    (the ``pagerank_supplier_rank`` discipline) so lineage stays flat
    across iterations and the co-count self-join behind ``edges`` runs
    once, not once per hop.

    Determinism: hop counts are integers; the visited set is a set —
    no floats, no ordering sensitivity. Output (s_suppkey, hop) is
    value-hash oracled.
    """
    edges = (_supplier_topk_edges(spark, sf_dir).select("src", "dst")
             .localCheckpoint(eager=True))
    return (bfs_hops_over_edges(edges, max_hops=max_hops)
            .select(F.col("sk").alias("s_suppkey"), "hop"))


def bfs_hops_over_edges(edges: DataFrame,
                        max_hops: int = BFS_MAX_HOPS) -> DataFrame:
    """The frontier-BFS loop over an arbitrary (src, dst) edge frame,
    seeded at the minimum ``src`` — factored out so property tests can
    drive it with random graphs against an independent Python BFS.
    Returns (sk, hop). The caller is responsible for materializing
    ``edges`` (localCheckpoint) — the loop references it every hop."""
    # hop-0 seed: the lowest node key that has any out-edge (a 1-row
    # aggregate, broadcast by construction)
    frontier = (edges.agg(F.min("src").alias("sk"))
                .withColumn("hop", F.lit(0).cast("bigint")))
    dist = frontier
    for h in range(1, max_hops + 1):
        nxt = (frontier.join(edges, frontier.sk == edges.src)
               .select(F.col("dst").alias("sk"))
               .distinct()
               .join(dist, "sk", "left_anti")
               .withColumn("hop", F.lit(h).cast("bigint"))
               .localCheckpoint(eager=True))
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt)
        frontier = nxt
    return dist


BFS_SQL = f"""
WITH RECURSIVE {_EDGES_SQL},
walk(sk, d) AS (
  SELECT MIN(src), 0 FROM edges
  UNION ALL
  SELECT e.dst, w.d + 1
  FROM walk w JOIN edges e ON e.src = w.sk
  WHERE w.d < {BFS_MAX_HOPS}
)
SELECT sk AS s_suppkey, CAST(MIN(d) AS BIGINT) AS hop
FROM walk GROUP BY sk
"""


WEDGE_CAP = 64  # hub cap for common-neighbor enumeration (see below)


def link_prediction_jaccard(spark: SparkSession, sf_dir: str,
                            cap: int = WEDGE_CAP,
                            topn: int = 20) -> DataFrame:
    """LINK PREDICTION on the supplier graph [EXT]: rank the top
    non-edges by common-neighbor Jaccard, with Adamic-Adar as the
    hub-discounted second opinion — the classic "who should be
    connected next" graph primitive (recommendations, entity
    resolution, graph completion).

    Common neighbors are enumerated by the wedge join (two rows of the
    symmetrized edge list meeting at z), with HUB NODES (degree >
    ``cap``) excluded from the wedge role: per-z work is degree², so
    one mega-hub would otherwise quadratically dominate — and
    Adamic-Adar's own 1/ln(deg) says hub-mediated evidence carries the
    least signal. The cap is part of the stated semantics and the
    oracle applies it identically. AA terms follow the bm25 ln idiom
    (round ln to 6dp, floor to integer micros per neighbor, THEN sum —
    order-independent).

    Scale: wedge fan-out bounded by cap² per node; candidate frame is
    O(edges * cap); the final global top-``topn`` is a
    ``row_number <= k`` shape Spark bounds with WindowGroupLimit."""
    e = _supplier_topk_edges(spark, sf_dir)
    und = (e.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
           .union(e.select(F.col("dst").alias("node"),
                           F.col("src").alias("nbr")))
           .distinct()
           # node-bounded edge list consumed 4x (degrees, wedge role,
           # both wedge sides via wn, the non-edge anti-join):
           # materialize once instead of re-deriving the top-k
           # co-occurrence graph per consumer (56-scan static plan;
           # measured 4.5s -> 3.6s at sf0.1 — the dedup_clusters
           # localCheckpoint lineage discipline)
           .localCheckpoint(eager=True))
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    # deg >= 2 guard: a degree-1 center can never form a wedge, and
    # its aa_term would divide by ln(1)=0 (Spark Infinity vs DuckDB
    # NULL under the cast) — filter it out so the invariant is explicit
    # rather than relying on the wedge join never reaching the value.
    wn = (und.join(deg, "node")
          .filter((F.col("deg") >= 2) & (F.col("deg") <= cap))
          .select("node", "nbr",
                  F.expr("CAST(floor(1000000.0 /"
                         " round(ln(CAST(deg AS DOUBLE)), 6) + 0.5)"
                         " AS BIGINT)").alias("aa_term")))
    a, b = wn.alias("a"), wn.alias("b")
    cand = (a.join(b, (F.col("a.node") == F.col("b.node"))
                   & (F.col("a.nbr") < F.col("b.nbr")))
            .groupBy(F.col("a.nbr").alias("u"), F.col("b.nbr").alias("v"))
            .agg(F.count(F.lit(1)).alias("n_common"),
                 F.sum(F.col("a.aa_term")).alias("aa_micro")))
    nonedge = cand.join(
        und, (cand.u == und.node) & (cand.v == und.nbr), "left_anti")
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    scored = (nonedge.join(du, "u").join(dv, "v")
              .withColumn("jaccard_ppm",
                          F.expr("n_common * 1000000"
                                 " DIV (deg_u + deg_v - n_common)")))
    rk = Window.orderBy(F.col("jaccard_ppm").desc(), "u", "v")
    # raw-rank filter first so WindowGroupLimit bounds the sort; cast
    # to bigint after, for oracle type parity
    return (scored.withColumn("rk", F.row_number().over(rk))
            .filter(F.col("rk") <= topn)
            .select("u", "v", "n_common", "deg_u", "deg_v",
                    "jaccard_ppm", "aa_micro",
                    F.col("rk").cast("bigint").alias("rank")))


LINK_PREDICTION_SQL = f"""
WITH {_EDGES_SQL},
und AS (
  SELECT src AS node, dst AS nbr FROM edges
  UNION
  SELECT dst AS node, src AS nbr FROM edges
), deg AS (
  SELECT node, COUNT(*) AS deg FROM und GROUP BY node
), wn AS (
  SELECT u.node, u.nbr,
         CAST(floor(1000000.0 / round(ln(CAST(d.deg AS DOUBLE)), 6)
                    + 0.5) AS BIGINT) AS aa_term
  FROM und u JOIN deg d ON u.node = d.node
  WHERE d.deg >= 2 AND d.deg <= {WEDGE_CAP}
), cand AS (
  SELECT a.nbr AS u, b.nbr AS v, COUNT(*) AS n_common,
         CAST(SUM(a.aa_term) AS BIGINT) AS aa_micro
  FROM wn a JOIN wn b ON a.node = b.node AND a.nbr < b.nbr
  GROUP BY 1, 2
), nonedge AS (
  SELECT c.* FROM cand c
  LEFT JOIN und e ON c.u = e.node AND c.v = e.nbr
  WHERE e.node IS NULL
), scored AS (
  SELECT n.u, n.v, n.n_common, du.deg AS deg_u, dv.deg AS deg_v,
         n.aa_micro,
         CAST(n.n_common * 1000000
              // (du.deg + dv.deg - n.n_common) AS BIGINT) AS jaccard_ppm
  FROM nonedge n
  JOIN deg du ON n.u = du.node
  JOIN deg dv ON n.v = dv.node
)
SELECT u, v, n_common, deg_u, deg_v, jaccard_ppm, aa_micro,
       CAST(rn AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY jaccard_ppm DESC, u, v) AS rn
      FROM scored)
WHERE rn <= 20
"""


# ---------------------------------------------------------------------------
# Native recursive CTE (Spark 4 WITH RECURSIVE)
# ---------------------------------------------------------------------------

RCTE_MAX_DEPTH = 3


def recursive_cte_reach_curve(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Spark 4's native ``WITH RECURSIVE`` exercised as an engine
    surface [EXT]: the supplier blast-radius GROWTH CURVE — per depth
    d in 0..RCTE_MAX_DEPTH, how many distinct suppliers are reachable
    within d hops of the lowest-keyed supplier, and how many are new
    at that depth. ``supplier_bfs_hops`` answers per-node distances
    with the scale-correct FRONTIER DataFrame loop; this op runs the
    recursion DECLARATIVELY in Spark SQL itself, proving the recursive
    CTE execution path end-to-end against DuckDB's identical
    recursion.

    Scale caveat (stated, not hidden): path-enumeration recursion
    materializes up to k^depth rows per seed — bounded here by ONE
    seed, the top-k edge cap (k=8) and depth 3, i.e. <= ~4k rows at
    any corpus size; at unbounded depth or all-seeds the frontier
    formulation is the only correct plan (see supplier_bfs_hops)."""
    # materialize BEFORE the view: the recursive execution references
    # the anchor relation once per level, and lazy lineage would re-run
    # the co-count self-join each time (10x soak: 3.8x before, ~2x
    # after — the supplier_bfs_hops localCheckpoint discipline)
    edges = (_supplier_topk_edges(spark, sf_dir).select("src", "dst")
             .localCheckpoint(eager=True))
    edges.createOrReplaceTempView("rcte_edges")
    return spark.sql(f"""
        WITH RECURSIVE walk(sk, d) AS (
          SELECT MIN(src), 0 FROM rcte_edges
          UNION ALL
          SELECT e.dst, w.d + 1
          FROM walk w JOIN rcte_edges e ON e.src = w.sk
          WHERE w.d < {RCTE_MAX_DEPTH}
        ), hops AS (
          SELECT sk, MIN(d) AS hop FROM walk GROUP BY sk
        )
        -- join-free curve: each node contributes one row per depth it
        -- is already reached at (seed hop=0 keeps every depth present)
        SELECT CAST(depth AS INT) AS depth,
               CAST(COUNT(*) AS BIGINT) AS reachable,
               CAST(COUNT(CASE WHEN depth = hop THEN 1 END) AS BIGINT)
                 AS newly_reached
        FROM (SELECT hop,
                     explode(sequence(hop, {RCTE_MAX_DEPTH})) AS depth
              FROM hops)
        GROUP BY depth
    """)


RCTE_REACH_SQL = f"""
WITH RECURSIVE {_EDGES_SQL},
walk(sk, d) AS (
  SELECT MIN(src), 0 FROM edges
  UNION ALL
  SELECT e.dst, w.d + 1
  FROM walk w JOIN edges e ON e.src = w.sk
  WHERE w.d < {RCTE_MAX_DEPTH}
), hops AS (
  SELECT sk, MIN(d) AS hop FROM walk GROUP BY sk
)
SELECT CAST(depth AS INT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS reachable,
       CAST(COUNT(CASE WHEN depth = hop THEN 1 END) AS BIGINT)
         AS newly_reached
FROM (SELECT hop, UNNEST(range(hop, {RCTE_MAX_DEPTH + 1})) AS depth
      FROM hops)
GROUP BY depth
"""


# ---------------------------------------------------------------------------
# Label-propagation communities (synchronous, deterministic tie-break)
# ---------------------------------------------------------------------------

LPA_ROUNDS = 4


def label_propagation_over_undirected(und, rounds: int = LPA_ROUNDS):
    """Synchronous label propagation (Raghavan et al. 2007) over a
    SYMMETRIC distinct (src, dst) edge frame, with the deterministic
    tie-break (highest neighbor-label frequency, then LOWEST label) so
    every round — and hence the final community assignment — is
    hash-exact and engine-replayable. Returns (node, lbl).

    Scale: each round is one edge-keyed join + one (node, lbl) hash
    aggregate + one per-node rank window PARTITIONED BY node —
    data-sized but fully parallel. Frames are localCheckpoint-ed per
    round (the pagerank/BFS lineage discipline): without it, round T
    re-executes all T-1 prior shuffles per reference."""
    labels = (und.select(F.col("src").alias("node"))
              .distinct()
              .select("node", F.col("node").alias("lbl"))
              .localCheckpoint(eager=True))
    for _ in range(rounds):
        msgs = (und.join(labels, und.dst == labels.node)
                .select(und.src.alias("n"), "lbl"))
        counts = msgs.groupBy("n", "lbl").agg(F.count(F.lit(1)).alias("c"))
        w = Window.partitionBy("n").orderBy(F.col("c").desc(),
                                            F.col("lbl").asc())
        labels = (counts.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1)
                  .select(F.col("n").alias("node"), "lbl")
                  .localCheckpoint(eager=True))
    return labels


def label_propagation_communities(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Community detection over the supplier co-occurrence graph via
    LPA_ROUNDS rounds of synchronous label propagation — the standard
    near-linear community algorithm (GraphX ships the same under
    ``lib.LabelPropagation``), made deterministic by the min-label
    tie-break. Output: one row per surviving community label with its
    member count (bounded by the supplier dim).

    Oracle: the SAME algorithm unrolled as LPA_ROUNDS chained CTEs —
    synchronous rounds are pure SQL once the round count is fixed.

    Scale: per round one join on the sparsified top-k edge list +
    one aggregate; supplier nodes are a fixed-size dim, and the edge
    list is degree-capped at k per source (``_supplier_topk_edges``),
    so rounds cost O(edges), never O(n^2)."""
    topk = _supplier_topk_edges(spark, sf_dir).select("src", "dst")
    und = (topk.unionByName(topk.select(F.col("dst").alias("src"),
                                        F.col("src").alias("dst")))
           .distinct().localCheckpoint(eager=True))
    labels = label_propagation_over_undirected(und)
    return (labels.groupBy(F.col("lbl").alias("community_label"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_members")))


def _lpa_sql() -> str:
    rounds = []
    prev = "l0"
    for i in range(1, LPA_ROUNDS + 1):
        rounds.append(f"""l{i} AS (
  SELECT node, lbl FROM (
    SELECT u.src AS node, l.lbl, COUNT(*) AS c,
           ROW_NUMBER() OVER (PARTITION BY u.src
                              ORDER BY COUNT(*) DESC, l.lbl) AS rn
    FROM und u JOIN {prev} l ON u.dst = l.node
    GROUP BY u.src, l.lbl)
  WHERE rn = 1
)""")
        prev = f"l{i}"
    return f"""
WITH {_EDGES_SQL},
und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges
    UNION ALL SELECT dst AS src, src AS dst FROM edges)
),
l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM und),
{", ".join(rounds)}
SELECT lbl AS community_label, COUNT(*) AS n_members
FROM {prev} GROUP BY lbl
"""


LPA_SQL = _lpa_sql()


QUERIES: dict[str, QueryFn] = {
    "link_prediction_jaccard": link_prediction_jaccard,
    "pagerank_supplier_rank": pagerank_supplier_rank,
    "triangle_count_suppliers": triangle_count_suppliers,
    "supplier_bfs_hops": supplier_bfs_hops,
    "label_propagation_communities": label_propagation_communities,
    "recursive_cte_reach_curve": recursive_cte_reach_curve,
}

ORACLES: dict[str, str] = {
    "link_prediction_jaccard": LINK_PREDICTION_SQL,
    "pagerank_supplier_rank": PAGERANK_SQL,
    "triangle_count_suppliers": TRIANGLE_SQL,
    "supplier_bfs_hops": BFS_SQL,
    "label_propagation_communities": LPA_SQL,
    "recursive_cte_reach_curve": RCTE_REACH_SQL,
}
