"""Round-6 batch-3 graph analytics over relational edge lists.

Dedup clustering (extensions/dedup.py) already ships the connected-
components primitive; this module adds the other graph audits a curation
pipeline runs on similarity/co-occurrence graphs: degree distribution
(how hub-by is the graph), triangle counting (local clustering — a
near-dup graph that is all triangles is a mirror farm), and PageRank
(which nodes anchor the graph). Reference parity: desdb had no graph
surface (SURVEY.md §2A — reconstructed); new engine capability.

Scale design notes are per-op; the shared rule is that every algorithm
here is edge-list relational — joins and aggregations only, no
driver-side adjacency structure, so Catalyst/AQE handle skew and the
edge list can be 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register
from desdb_spark.session import load_table


@register(
    "graph_degree_stats",
    oracle="""
        WITH edges AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        ), deg AS (
            SELECT l_partkey, count(*) AS degree FROM edges GROUP BY l_partkey
        )
        SELECT degree, CAST(count(*) AS BIGINT) AS n_parts
        FROM deg GROUP BY degree
    """,
    group="graph_ext",
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the part–supplier bipartite graph: for each
    part, how many distinct suppliers ship it, then how many parts sit
    at each degree — the hub-detection audit (a degree-10000 node in a
    similarity graph is a boilerplate cluster, not a document).

    Scale shape: DISTINCT edge projection, degree count, histogram —
    three map-side-combinable aggregations, shuffling keys only. The
    classic skew trap (counting a hub's edges) is exactly what partial
    aggregation absorbs.
    """
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select("l_partkey", "l_suppkey").distinct()
    deg = edges.groupBy("l_partkey").agg(F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(F.count("*").cast("bigint").alias("n_parts"))


@register(
    "graph_triangle_count",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
            WHERE a.l_partkey < b.l_partkey
              AND a.l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
              AND b.l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
        )
        SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM pairs e1
        JOIN pairs e2 ON e1.v = e2.u
        JOIN pairs e3 ON e1.u = e3.u AND e2.v = e3.v
    """,
    group="graph_ext",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count of the part co-order graph for ship-year
    1995 (parts linked when the same order ships both that year) — the
    clustering-coefficient numerator used to tell organic neighborhoods
    from mirror farms in near-dup graphs.

    Graph choice is a SCALE decision, not cosmetic: the r6c first cut
    used the supplier co-order graph, whose 1000-node vertex set is
    FIXED while co-order incidences grow with SF — at sf0.1 it is
    near-complete (~5·10⁵ edges, ~10⁸ wedges) and OOMed the sweep. The
    part graph's vertex count grows WITH the data (20k parts at sf0.1),
    so mean degree — and therefore wedge fan-out per node — stays ~flat
    across scale factors; the one-year ship-date slice bounds it
    further. That is the graph you can actually count triangles on at
    100 TB.

    Scale shape: edges are canonicalized u<v, then oriented by
    (degree, id) so every wedge is generated exactly once at its
    lowest-degree vertex — the standard distributed-triangle trick
    (Suri & Vassilvitskii's MapReduce formulation, public literature):
    wedge fan-out is Σ d_oriented², bounded because high-degree hubs
    never originate wedges. The oracle counts the same triangles from
    the unoriented form (each triangle once via u<v<w closure).
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            F.col("l_shipdate").between(
                F.lit("1995-01-01").cast("date"), F.lit("1995-12-31").cast("date")
            )
        )
        .select("l_orderkey", F.col("l_partkey").alias("node"))
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .where(F.col("a.node") < F.col("b.node"))
        .select(F.col("a.node").alias("u"), F.col("b.node").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    # Orient each edge from its lower-(degree, id) endpoint.
    e = (
        edges.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
    )
    w1, w2 = e.alias("w1"), e.alias("w2")
    wedges = (
        w1.join(w2, F.col("w1.s") == F.col("w2.s"))
        .where(F.col("w1.t") < F.col("w2.t"))
        .select(F.col("w1.t").alias("x"), F.col("w2.t").alias("y"))
    )
    closing = e.select(
        F.least("s", "t").alias("x"), F.greatest("s", "t").alias("y")
    ).distinct()
    return (
        wedges.join(closing, ["x", "y"])
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )


def pagerank(
    edges: DataFrame,
    alpha: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """Power-iteration PageRank over a (src, dst) edge DataFrame.

    DataFrame loop in the MLlib iterative style: each round materializes
    the rank vector (``localCheckpoint(eager=True)`` — truncates lineage
    so 10 iterations don't compound into one unplannable DAG; at cluster
    scale use ``setCheckpointDir`` + ``checkpoint``), reduces the
    dangling mass to ONE driver-side scalar (nodes with no out-edges
    donate their rank uniformly — the textbook Brin–Page formulation),
    then folds it into the next round as a literal. The scalar reduce is
    deliberate: attaching a 1-row aggregate via join would either plan a
    BroadcastNestedLoopJoin (crossJoin) or get constant-folded back into
    one (literal-key equi-join), and a per-iteration 8-byte action over
    an already-materialized vector is the standard distributed-iterative
    pattern (GraphX does the same reduce).

    Scale shape per iteration: one shuffle join on src (edges can be
    pre-partitioned by src once and reused) + one aggregation on dst +
    one scalar reduce. No driver-side state beyond the scalar.

    r12 plan rework (same arithmetic, NumPy parity test unchanged):
    (a) ``edges`` is checkpointed ONCE up front — previously ``nodes``,
    ``norm`` and the per-iteration dangling-mass probe each re-derived
    it, so a 10-round run recomputed the caller's edge join ~12×;
    (b) the static "is dangling" flag is folded into the rank frame
    itself, so the per-round scalar reduce is a filter+sum over the
    already-materialized vector instead of a fresh shuffle join against
    a recomputed out-degree frame; (c) checkpoints are lazy and the
    dmass reduce doubles as the materializing action — ONE job per
    iteration where the r11 shape ran two.
    """
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    norm = edges.join(outdeg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("share")
    ).localCheckpoint(eager=False)
    has_out = outdeg.select(F.col("src").alias("node"), F.lit(1).alias("has_out"))
    nodes = (
        nodes.join(has_out, "node", "left")
        .select("node", F.col("has_out").isNull().alias("dang"))
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    ranks = nodes.select(
        "node", "dang", F.lit(1.0 / n).alias("rank")
    ).localCheckpoint(eager=False)
    for _ in range(iterations):
        dmass = (
            ranks.where(F.col("dang"))
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
            .first()[0]
        )
        contrib = (
            ranks.join(norm, ranks.node == norm.src)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("share")).alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                "dang",
                (
                    F.lit((1.0 - alpha) / n)
                    + F.lit(alpha)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dmass / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", "rank")


#: Fixed-point rank unit: 1.0 of probability mass = 10^12 picos.
PR_SCALE = 1_000_000_000_000
#: Damping as an integer ratio (α = 85/100).
PR_ALPHA_NUM = 85
PR_ALPHA_DEN = 100
PR_ITERATIONS = 10


def pagerank_fixedpoint(
    edges: DataFrame, iterations: int = PR_ITERATIONS
) -> DataFrame:
    """Power-iteration PageRank in exact BIGINT pico-units — the cents
    discipline (emb_gram_matrix, linalg_ext.py) applied to graph
    iteration, which is what makes a 10-round iterative algorithm
    differentially hashable at all: every step is integer multiply /
    floor-divide / sum, so no float summation order can drift between
    engines, and the truncation dust (< 1 pico per node per round) is
    identically placed in both.

    Same distributed shape as :func:`pagerank` (one shuffle join on src
    + one aggregation on dst + one 8-byte scalar reduce per round,
    lineage truncated per round via ``localCheckpoint``); only the
    arithmetic domain changed. Carries the same r12 plan rework as the
    float kernel: edges checkpointed once, the static dangling flag
    rides the rank frame, and the per-round dmass reduce is the single
    materializing action (one job per iteration, down from two plus a
    re-derived out-degree join).
    """
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("od"))
    edg = edges.join(outdeg, "src").localCheckpoint(eager=False)
    has_out = outdeg.select(F.col("src").alias("node"), F.lit(1).alias("has_out"))
    nodes = (
        nodes.join(has_out, "node", "left")
        .select("node", F.col("has_out").isNull().alias("dang"))
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    base = (PR_ALPHA_DEN - PR_ALPHA_NUM) * PR_SCALE // (PR_ALPHA_DEN * n)
    ranks = nodes.select(
        "node", "dang", F.lit(PR_SCALE // n).cast("bigint").alias("rank")
    ).localCheckpoint(eager=False)
    contrib_expr = F.expr(
        f"({PR_ALPHA_NUM} * rank) div ({PR_ALPHA_DEN} * od)"
    )
    for _ in range(iterations):
        dmass = (
            ranks.where(F.col("dang"))
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("dm"))
            .first()[0]
        )
        dterm = PR_ALPHA_NUM * int(dmass) // (PR_ALPHA_DEN * n)
        contrib = (
            ranks.join(edg, ranks.node == edg.src)
            .groupBy("dst")
            .agg(F.sum(contrib_expr).alias("f"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                "dang",
                (F.lit(base) + F.coalesce(F.col("f"), F.lit(0)) + F.lit(dterm))
                .cast("bigint")
                .alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", "rank")


def _pagerank_oracle(iterations: int = PR_ITERATIONS) -> str:
    """The UNROLLED power iteration as one DuckDB CTE chain — ten
    join+aggregate rounds with the dangling-mass scalar as a subquery
    per round, mirroring the Spark arithmetic term for term. Standard
    SQL forbids aggregation in a recursive term, so a fixed iteration
    count unrolls instead; generation is mechanical to keep the two
    sides provably in sync with the constants above."""
    a, d, s = PR_ALPHA_NUM, PR_ALPHA_DEN, PR_SCALE
    sql = f"""
        WITH edges AS MATERIALIZED (
            SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                            's' || CAST(l_suppkey AS VARCHAR) AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ), nodes AS MATERIALIZED (
            SELECT src AS node FROM edges UNION SELECT dst FROM edges
        ), nn AS MATERIALIZED (
            SELECT count(*) AS n FROM nodes
        ), outdeg AS MATERIALIZED (
            SELECT src, count(*) AS od FROM edges GROUP BY src
        ), r0 AS MATERIALIZED (
            SELECT node, {s} // (SELECT n FROM nn) AS rank FROM nodes
        )"""
    for k in range(1, iterations + 1):
        sql += f""", d{k} AS MATERIALIZED (
            SELECT COALESCE(sum(r.rank), 0) AS dm
            FROM r{k - 1} r LEFT JOIN outdeg o ON o.src = r.node
            WHERE o.od IS NULL
        ), infl{k} AS MATERIALIZED (
            SELECT e.dst AS node, sum(({a} * r.rank) // ({d} * o.od)) AS f
            FROM r{k - 1} r
            JOIN edges e ON e.src = r.node
            JOIN outdeg o ON o.src = e.src
            GROUP BY e.dst
        ), r{k} AS MATERIALIZED (
            SELECT n.node,
                   ({d - a} * {s}) // ({d} * (SELECT n FROM nn))
                   + COALESCE(i.f, 0)
                   + ({a} * (SELECT dm FROM d{k})) // ({d} * (SELECT n FROM nn))
                       AS rank
            FROM nodes n LEFT JOIN infl{k} i ON i.node = n.node
        )"""
    sql += f"""
        SELECT node, CAST(rank AS BIGINT) AS rank_picos
        FROM r{iterations} ORDER BY rank DESC, node LIMIT 20"""
    return sql
