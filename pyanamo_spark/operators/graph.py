"""Graph analytics over relationship edges: fixed-iteration PageRank
and first-order Markov transition matrices.

Reference parity: the reference models work as a dependency web —
items fan out to nested tasks and join back through job states
(/root/reference/code/pyanamo/modifier.py nest paths); ranking the
hub entities of that web and profiling state-to-state transition
probabilities are the analytical questions its DynamoDB layout cannot
answer without a full-table export. North-star extensions: link-graph
quality ranking and behavior-sequence transition models are standard
curation signals for web-scale training corpora.

Scale shapes:
- PageRank is the canonical iterative distributed algorithm. The edge
  list is grouped ONCE into a checkpointed adjacency table
  (src, nbrs[], outdeg); each of the K fixed iterations joins the
  node-sized rank table to it (AQE broadcasts the rank side),
  explodes contributions in-task, and aggregates per destination —
  the per-round exchange carries node-sized partial sums, never edge
  rows. A small fixed K runs as one lazy plan (periodic checkpoints
  only at higher K). The only driver-side value is the node count
  (one scalar) — never the rank table.
- Transition counts are one window pass (lag over each entity's
  ordered history) plus one STATES²-bounded aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pyanamo_spark.registry import register

_PR_DAMPING = 0.85
_PR_ITERS = 5


def _pagerank_oracle() -> str:
    """Unrolled fixed-iteration PageRank as pure ANSI SQL.

    DuckDB has no iteration primitive that matches a damped fixpoint
    cleanly, so the K iterations are unrolled as K chained CTEs — the
    exact same recurrence the Spark loop executes:
    r_{k+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} r_k(u)/outdeg(u).
    """
    head = """
WITH pairs AS (
  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS a,
                  's' || CAST(l_suppkey AS VARCHAR) AS b
  FROM lineitem
),
edges AS (
  SELECT a, b FROM pairs
  UNION ALL
  SELECT b AS a, a AS b FROM pairs
),
deg AS (SELECT a, COUNT(*) AS outdeg FROM edges GROUP BY a),
nodes AS (SELECT a AS node FROM deg),
nn AS (SELECT COUNT(*) AS cnt FROM nodes),
r0 AS (SELECT node, 1.0 / (SELECT cnt FROM nn) AS r FROM nodes)"""
    iters = []
    for k in range(1, _PR_ITERS + 1):
        iters.append(f""",
r{k} AS (
  SELECT n.node,
         {1 - _PR_DAMPING} / (SELECT cnt FROM nn)
         + {_PR_DAMPING} * COALESCE(SUM(r{k - 1}.r / d.outdeg), 0) AS r
  FROM nodes n
  LEFT JOIN edges e ON e.b = n.node
  LEFT JOIN deg d ON d.a = e.a
  LEFT JOIN r{k - 1} ON r{k - 1}.node = e.a
  GROUP BY n.node
)""")
    tail = f"""
SELECT node, ROUND(r, 6) AS pagerank FROM r{_PR_ITERS}
"""
    return head + "".join(iters) + tail


@register("q_pagerank", oracle=_pagerank_oracle())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (d=0.85, 5 iterations) over the part↔supplier
    supply graph: distinct (part, supplier) lineitem pairs, symmetric
    edges, so sourcing hubs rank high. Symmetry guarantees outdeg ≥ 1
    everywhere — no dangling-mass term is needed.

    Scale shape (r12): the edge list crosses the network ONCE — the
    adjacency build groups edges into one checkpointed
    (src, nbrs[], outdeg) row per node. Each iteration then joins the
    node-sized rank table against the adjacency (AQE broadcasts the
    rank side), explodes contributions in-task, and partially
    aggregates per destination, so the per-round exchange carries
    node-sized partial sums, never edge rows. The r11 form re-shuffled
    the edge⋈deg join input every round and left-joined the node set
    back on top — symmetric edges make indeg ≥ 1 everywhere, so that
    outer join was a structural no-op (every node receives a
    contribution) and is gone, as are its five node-set exchanges
    (plan: 14 shuffle Exchanges → 5, all node-sized partial sums, and
    every remaining per-round join is a broadcast; sf0.1 5.46→2.3-3.1 s,
    sf1 13.4→8.9 s, output bit-identical at sf0.001/0.01/0.1/1). Node count is the single
    driver scalar. Joins shuffle 8-byte long node ids, never strings —
    display ids materialize only in the final projection. Hub caveat:
    one adjacency row holds one node's whole neighbor list; on a
    power-law web graph at extreme scale, split hub rows into bounded
    sub-arrays (carry outdeg alongside, contributions stay additive) —
    this bipartite supply graph's max degree is catalog-bounded, so
    the plain build is the right default here.
    """
    # long node ids (part k → 2k, supplier k → 2k+1): every join and
    # aggregation in the fixpoint shuffles 8-byte keys instead of
    # strings; the display id is reconstructed once at output
    pairs = (
        spark.table("lineitem")
        .select(
            (F.col("l_partkey") * 2).cast("long").alias("a"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("b"),
        )
        .distinct()
    )
    edges = pairs.union(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
    adj = (
        edges.groupBy("a")
        .agg(F.collect_list("b").alias("nbrs"))
        .select("a", "nbrs", F.size("nbrs").cast("long").alias("outdeg"))
        .localCheckpoint()  # ONE job pins the whole graph; the
        # distinct's exchange is reused across both union legs
    )
    n = adj.count()  # bounded driver scalar: the node count
    if n == 0:  # empty-corpus contract: schema-stable empty result
        return spark.createDataFrame([], "node string, pagerank double")

    ranks = adj.select(F.col("a").alias("node"), F.lit(1.0 / n).alias("r"))
    for it in range(_PR_ITERS):
        ranks = (
            adj.join(ranks, adj["a"] == ranks["node"])
            .select(
                F.explode("nbrs").alias("dst"),
                (F.col("r") / F.col("outdeg")).alias("c0"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.lit((1 - _PR_DAMPING) / n)
                    + F.lit(_PR_DAMPING) * F.sum("c0")
                ).alias("r")
            )
        )
        # FIXED iteration counts this small (5) run as ONE lazy plan —
        # every eager localCheckpoint is a full Spark job whose
        # scheduling cost dwarfs these joins. Lineage truncation is
        # only needed when the round count is data-dependent and can
        # compound (the convergence loops in dedup/clusters.py); at
        # higher fixed counts re-introduce a checkpoint every ~8
        # rounds to keep the plan bounded.
        if (it + 1) % 8 == 0:
            ranks = ranks.localCheckpoint()
    node_str = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("p"), (F.col("node") / 2).cast("long")),
    ).otherwise(F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("long")))
    return ranks.select(
        node_str.alias("node"), F.round("r", 6).alias("pagerank")
    )


@register(
    "q_transitions",
    oracle="""
WITH t AS (
  SELECT event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type
  FROM events
)
SELECT prev_type,
       event_type AS next_type,
       COUNT(*) AS n,
       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY prev_type),
             6) AS p
FROM t
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
""",
)
def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    every (previous state → next state) pair, the transition count and
    its row-normalized probability. The behavior-sequence model a
    funnel/anomaly pipeline starts from.

    Scale shape: ONE window pass (lag within each user's ordered
    history — the same per-entity exchange every sequence op here
    pays) collapsing straight into a STATES²-sized aggregate; the
    normalizing window then runs over that tiny table, not the facts.
    Ties break on event_id so both engines pick the same predecessor.
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        spark.table("events")
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    agg = steps.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    wp = W.partitionBy("prev_type")
    return agg.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    )


@register(
    "q_degree_stats",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
pd AS (
  SELECT 'part' AS side, degree FROM (
    SELECT l_partkey, COUNT(*) AS degree FROM pairs GROUP BY l_partkey
  )
  UNION ALL
  SELECT 'supplier' AS side, degree FROM (
    SELECT l_suppkey, COUNT(*) AS degree FROM pairs GROUP BY l_suppkey
  )
)
SELECT side, CAST(degree AS BIGINT) AS degree, COUNT(*) AS n_nodes
FROM pd
GROUP BY side, degree
""",
)
def q_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the supply graph, per side of the
    bipartition: how many parts have k suppliers and how many
    suppliers serve k parts — the skew diagnostic run BEFORE
    q_pagerank (a power-law hub predicts which join keys need the
    salting/AQE treatment).

    Scale shape: distinct on the pair (map-combined), one count per
    side keyed by node, then a DEGREES-sized histogram aggregation.
    The union is of two independently aggregated legs — each leg's
    exchange carries only (key, count) pairs.
    """
    pairs = (
        spark.table("lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    part_deg = (
        pairs.groupBy("l_partkey")
        .agg(F.count("*").alias("degree"))
        .select(F.lit("part").alias("side"), "degree")
    )
    supp_deg = (
        pairs.groupBy("l_suppkey")
        .agg(F.count("*").alias("degree"))
        .select(F.lit("supplier").alias("side"), "degree")
    )
    return (
        part_deg.unionByName(supp_deg)
        .groupBy("side", F.col("degree").cast("long").alias("degree"))
        .agg(F.count("*").alias("n_nodes"))
    )
