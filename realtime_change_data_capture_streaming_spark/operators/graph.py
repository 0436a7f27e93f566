"""Iterative graph analytics as DataFrame loops — PageRank over the
customer<->supplier purchase graph.

The graph: an undirected edge per distinct (customer, supplier) pair that
ever traded (orders x lineitem); node ids disambiguate the two key spaces
(customer -> 2k, supplier -> 2k+1).  PageRank runs a FIXED number of
power iterations as a Python loop over joins + hash aggregations — the
standard Spark shape for iterative algorithms (each iteration is one
shuffle on dst; the rank side is broadcast-small locally and co-partitioned
with edges at scale).

Reproducible-iteration discipline (same idea as the fixed-point IVF
centroids in ``llm_ops/similarity.py``): float PageRank depends on
summation order, so ranks are scaled integers (SCALE = 1e12) and the
update uses only integer multiply / integer division / integer sum —
associative, commutative, hence bit-identical on any engine and any
partitioning.  That makes a 3-iteration PageRank exactly replayable in
DuckDB as three unrolled CTE levels, giving an ORACLE row for an operator
class ("iterative algorithms") that is usually rows-only.

The node count enters the plan as a broadcast scalar (crossJoin of a
1-row aggregate), not a driver ``collect()`` — the whole computation is
one lazy plan.

At 100 TB: edges get bucketed/co-partitioned by src so each iteration's
join is shuffle-free; the per-iteration ``localCheckpoint`` (lineage
truncation, as in ``llm_ops/dedup.py`` connected components) would bound
plan growth for larger iteration counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.operators.stats import CO_PURCHASE_PAIRS_SQL, co_purchase_pairs
from realtime_change_data_capture_streaming_spark.sources.tables import load_table

#: fixed-point scale for integer PageRank
SCALE = 10**12
#: damping factor 0.85 expressed as the integer pair (85, 100)
DAMP_NUM, DAMP_DEN = 85, 100
ITERATIONS = 3


def purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected trading graph: one edge per distinct (customer, supplier)
    pair, emitted in both directions so every node has outdegree >= 1 (no
    dangling-mass handling needed)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey").cast("bigint") * 2).alias("c"),
            (F.col("l_suppkey").cast("bigint") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    # both directions via ONE explode, not a self-union: the union form
    # duplicated the join+distinct subtree in every consumer's plan (the
    # r16 plan audit read 52 parquet scans in the pagerank plan), where
    # explode is a narrow op over a single derivation (guide §2.4)
    return pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")


def graph_pagerank_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration fixed-point PageRank; returns (node, rank_scaled) with
    rank_scaled = rank * 1e12 as an exact bigint."""
    edges = purchase_edges(spark, sf_dir)
    # loop-invariant relations: without persist, every iteration's plan
    # re-derives the distinct-pair graph from lineitem x orders (3x the
    # dominant cost); with it, an iteration is one join + one hash agg.
    # adj is persisted PARTITIONED AND SORTED on the join key: the cache
    # preserves both, so each iteration's sort-merge join needs no
    # exchange and no sort on the edge side — only the node-sized ranks
    # table moves per round (guide §2.4: operations keyed the same way
    # share one exchange; before this, every iteration re-shuffled and
    # re-sorted the cached edge table, the largest relation in the
    # query).  ranks itself comes out of groupBy("dst") already hash-
    # partitioned on the renamed join key, so the per-iteration plan is
    # exactly ONE exchange — the contrib aggregation, PageRank's
    # irreducible shuffle.
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    n1 = deg.agg(F.count(F.lit(1)).alias("n"))  # 1-row broadcast scalar
    adj = edges.join(deg, "src").repartition("src").sortWithinPartitions("src").persist()
    # materialize the cache BEFORE compiling the iterations: an unfilled
    # cache under AQE reports unknown output partitioning
    # (AdaptiveSparkPlan isFinalPlan=false), so every iteration's join
    # would conservatively re-exchange and re-sort the cached edge table;
    # once filled, consumers compile against the recorded (src-hash,
    # src-sorted) layout.  The count does the same work iteration 1 would
    # have paid to fill the cache — it is moved, not added.
    adj.count()

    ranks = (
        deg.select(F.col("src").alias("node"))
        .crossJoin(F.broadcast(n1))
        .select("node", F.expr(f"cast({SCALE} div n as bigint)").alias("r"))
    )
    for _ in range(ITERATIONS):
        contrib = adj.join(ranks, adj.src == ranks.node).select(
            "dst",
            F.expr(f"(r * {DAMP_NUM}) div ({DAMP_DEN} * outdeg)").alias("contrib"),
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
            .crossJoin(F.broadcast(n1))
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"cast((({DAMP_DEN - DAMP_NUM} * cast({SCALE} as bigint))"
                    f" div ({DAMP_DEN} * n)) + s as bigint)"
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def _iter_sql(prev: str, this: str) -> str:
    return f"""{this} AS (
  SELECT e.dst AS node,
         ({DAMP_DEN - DAMP_NUM} * CAST({SCALE} AS BIGINT)) // ({DAMP_DEN} * p.n)
           + SUM((r.r * {DAMP_NUM}) // ({DAMP_DEN} * d.outdeg)) AS r
  FROM edges e
  JOIN {prev} r ON r.node = e.src
  JOIN deg d ON d.src = e.src, params p
  GROUP BY e.dst, p.n
)"""


PAGERANK_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) * 2 AS c,
                  CAST(l.l_suppkey AS BIGINT) * 2 + 1 AS s
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
), edges AS (
  SELECT c AS src, s AS dst FROM pairs UNION ALL SELECT s, c FROM pairs
), deg AS (
  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
), params AS (
  SELECT COUNT(*) AS n FROM deg
), r0 AS (
  SELECT src AS node, CAST({SCALE} AS BIGINT) // n AS r FROM deg, params
), {_iter_sql("r0", "i1")}, {_iter_sql("i1", "i2")}, {_iter_sql("i2", "i3")}
SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM i3
"""




_TRI_SUPPORT = 2  # co-purchase support threshold: edge = pair ordered together >= 2 times


def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the frequent co-purchase graph — the
    clustering-coefficient / community-detection primitive.

    Edges: part pairs ordered together >= _TRI_SUPPORT times, stored once
    in (lo, hi) orientation so each triangle is enumerated exactly once
    by the two-hop join e1(a,b) |> e2(b,c) |> e3(a,c) with a < b < c.
    Output: per-node triangle participation (nodes in >= 1 triangle).

    Scale shape: support thresholding sparsifies the graph BEFORE the
    quadratic step (the same candidate-pruning idea as LSH banding); the
    (lo, hi) orientation is the standard each-triangle-once trick, and
    the production refinement for skewed degree distributions is to
    orient by (degree, id) instead of raw id so the join fanout is
    bounded by sqrt(m) per node.  All joins are equi-joins on node ids —
    no cartesian anywhere."""
    edges = (
        co_purchase_pairs(spark, sf_dir)
        .groupBy(F.col("part_a").alias("pa"), F.col("part_b").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _TRI_SUPPORT)
        .select("pa", "pb")
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tris = (
        e1.join(e2, F.col("e1.pb") == F.col("e2.pa"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .select(
            F.col("e1.pa").alias("x"), F.col("e1.pb").alias("y"), F.col("e2.pb").alias("z")
        )
    )
    nodes = tris.select(F.explode(F.array("x", "y", "z")).alias("part"))
    return nodes.groupBy("part").agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))


TRIANGLE_SQL = f"""
WITH {CO_PURCHASE_PAIRS_SQL},
e AS (
  SELECT part_a AS pa, part_b AS pb
  FROM pairs
  GROUP BY 1, 2 HAVING COUNT(*) >= {_TRI_SUPPORT}
), tris AS (
  SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
  FROM e e1 JOIN e e2 ON e1.pb = e2.pa
            JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
), nodes AS (
  SELECT UNNEST([x, y, z]) AS part FROM tris
)
SELECT part, COUNT(*) AS n_triangles FROM nodes GROUP BY part
"""


_LPA_ITERS = 3


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation over the
    frequent co-purchase graph: every node starts as its own label; each
    round it adopts the most frequent label among its neighbors (ties ->
    smallest label, isolated ties impossible since labels are ints), run
    for a FIXED iteration count — the determinism discipline that makes
    an otherwise order-sensitive heuristic replay exactly in the oracle
    (async LPA is run-order-dependent; sync + min-label tie-break is a
    pure function of the graph).

    Per iteration: one join of the symmetric edge list to the label
    table (edge-cardinality shuffle) + one (node, label) count agg + one
    min_by pick — the textbook Pregel round as DataFrame ops.  Output:
    per COMMUNITY member count and smallest member (communities of the
    converged labeling)."""
    edges = (
        co_purchase_pairs(spark, sf_dir)
        .groupBy(F.col("part_a").alias("pa"), F.col("part_b").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _TRI_SUPPORT)
        .select("pa", "pb")
    )
    sym = edges.unionByName(
        edges.select(F.col("pb").alias("pa"), F.col("pa").alias("pb"))
    ).localCheckpoint(eager=True)  # loop-invariant adjacency, built once
    labels = sym.select(F.col("pa").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(_LPA_ITERS):
        nbr = sym.join(labels, sym["pb"] == labels["node"]).select(
            F.col("pa").alias("node"), "label"
        )
        counts = nbr.groupBy("node", "label").agg(F.count(F.lit(1)).alias("c"))
        labels = (
            counts.groupBy("node")
            .agg(F.min_by(F.struct("label"), F.struct(-F.col("c"), F.col("label"))).alias("m"))
            .select("node", F.col("m.label").alias("label"))
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
    return labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min("node").cast("bigint").alias("min_member"),
    ).select(F.col("label").cast("bigint").alias("community"), "n_members", "min_member")


def _lpa_sql() -> str:
    chain = f"""
WITH {CO_PURCHASE_PAIRS_SQL},
e AS (
  SELECT part_a AS pa, part_b AS pb
  FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= {_TRI_SUPPORT}
), sym AS (
  SELECT pa, pb FROM e UNION ALL SELECT pb, pa FROM e
), l0 AS (
  SELECT DISTINCT pa AS node, pa AS label FROM sym
)"""
    prev = "l0"
    for t in range(_LPA_ITERS):
        chain += f""",
n{t} AS (
  SELECT s.pa AS node, l.label, COUNT(*) AS c
  FROM sym s JOIN {prev} l ON l.node = s.pb
  GROUP BY 1, 2
), l{t + 1} AS (
  SELECT node, label FROM (
    SELECT node, label, ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rk
    FROM n{t}
  ) WHERE rk = 1
)"""
        prev = f"l{t + 1}"
    return f"""{chain}
SELECT CAST(label AS BIGINT) AS community,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MIN(node) AS BIGINT) AS min_member
FROM {prev} GROUP BY 1
"""


LPA_SQL = _lpa_sql()


_BFS_DEPTH = 3


def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth BFS reachability over the frequent co-purchase
    graph: min-hop distance from the smallest node to every node within
    {_BFS_DEPTH} hops — the k-hop neighborhood query (fraud rings,
    recommendation radius).

    Distributed frontier expansion: per hop ONE join of the (new)
    frontier to the loop-invariant adjacency + one left-anti against the
    visited set, so each round's shuffle is frontier-sized and a node is
    expanded exactly once — never the path-explosion form (paths grow
    combinatorially; frontiers are bounded by |V|).  The seed is a 1-row
    bounded collect (the BPE-argmax shape).  Oracle: DuckDB WITH
    RECURSIVE in UNION (distinct) mode + MIN(hop), which dedups
    (node, hop) states per round and therefore also avoids path
    enumeration."""
    edges = (
        co_purchase_pairs(spark, sf_dir)
        .groupBy(F.col("part_a").alias("pa"), F.col("part_b").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _TRI_SUPPORT)
        .select("pa", "pb")
    )
    sym = edges.unionByName(
        edges.select(F.col("pb").alias("pa"), F.col("pa").alias("pb"))
    ).localCheckpoint(eager=True)
    seed = int(sym.agg(F.min("pa")).collect()[0][0])  # 1-row bounded collect
    visited = spark.createDataFrame([(seed, 0)], "part bigint, hop bigint")
    frontier = visited.select("part")
    for h in range(1, _BFS_DEPTH + 1):
        nxt = (
            frontier.join(sym, frontier["part"] == sym["pa"])
            .select(F.col("pb").alias("part"))
            .distinct()
            .join(visited.select("part"), "part", "left_anti")
        )
        visited = visited.unionByName(
            nxt.withColumn("hop", F.lit(h).cast("bigint"))
        ).localCheckpoint(eager=True)
        frontier = nxt
    return visited


BFS_SQL = f"""
WITH RECURSIVE {CO_PURCHASE_PAIRS_SQL},
e AS (
  SELECT part_a AS pa, part_b AS pb
  FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= {_TRI_SUPPORT}
), sym AS (
  SELECT pa, pb FROM e UNION ALL SELECT pb, pa FROM e
), seed AS (
  SELECT MIN(pa) AS s FROM sym
), bfs AS (
  SELECT s AS part, 0 AS hop FROM seed
  UNION
  SELECT sym.pb, bfs.hop + 1 FROM bfs JOIN sym ON sym.pa = bfs.part
  WHERE bfs.hop < {_BFS_DEPTH}
)
SELECT CAST(part AS BIGINT) AS part, CAST(MIN(hop) AS BIGINT) AS hop
FROM bfs GROUP BY 1
"""


QUERIES = {
    "graph_bfs_hops": graph_bfs_hops,
    "graph_pagerank_purchases": graph_pagerank_purchases,
    "graph_triangle_counts": graph_triangle_counts,
    "graph_label_propagation": graph_label_propagation,
}
ORACLE = {
    "graph_bfs_hops": BFS_SQL,
    "graph_pagerank_purchases": PAGERANK_SQL,
    "graph_triangle_counts": TRIANGLE_SQL,
    "graph_label_propagation": LPA_SQL,
}
