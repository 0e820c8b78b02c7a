"""Provenance / lineage walks (SURVEY.md §2A A7, §3 EP3).

Reference parity: desdb's ``Coadd.load(srclist=True)`` walked a
self-referencing image table — follow ``parentid`` from each coadd source
image until ``filetype='red'`` — via a client-side loop of IN-list queries
[desdb:files.py — SURVEY.md §0]. Two engine forms:

- :func:`lineage_walk_recursive` — SQL ``WITH RECURSIVE`` (verified
  working in Spark 4.1.2), the declarative form.
- :func:`lineage_walk_loop` — driver-side iterative joins with
  ``localCheckpoint`` per step, the form that scales when recursion depth
  is small but each frontier is huge (each iteration is a distributed
  join; checkpointing truncates the growing plan).

The fixtures have no self-referencing table, so tests build one (a parent
chain derived from orders); the fixed-depth fixture-backed variant is
``join_lineage_walk`` in operators/joins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from desdb_spark.registry import register


def lineage_walk_recursive(
    edges: DataFrame, roots: DataFrame, max_depth: int = 20
) -> DataFrame:
    """Resolve each root id to its terminal ancestor via WITH RECURSIVE.

    ``edges``: (id, parent_id) with parent_id NULL at terminals.
    ``roots``: (id). Returns (root_id, terminal_id, depth).
    """
    spark = edges.sparkSession
    edges.createOrReplaceTempView("_lineage_edges")
    roots.createOrReplaceTempView("_lineage_roots")
    return spark.sql(
        f"""
        WITH RECURSIVE walk (root_id, cur_id, depth) AS (
            SELECT r.id AS root_id, r.id AS cur_id, 0 AS depth
            FROM _lineage_roots r
            UNION ALL
            SELECT w.root_id, e.parent_id AS cur_id, w.depth + 1
            FROM walk w
            JOIN _lineage_edges e ON e.id = w.cur_id
            WHERE e.parent_id IS NOT NULL AND w.depth < {int(max_depth)}
        )
        SELECT root_id, cur_id AS terminal_id, depth
        FROM (
            SELECT *, row_number() OVER (PARTITION BY root_id ORDER BY depth DESC) AS rn
            FROM walk
        ) WHERE rn = 1
        """
    )


@register(
    "lineage_walk_recursive_cte",
    oracle="""
        WITH RECURSIVE walk (root_id, cur_id, depth) AS (
            SELECT o_orderkey AS root_id, o_orderkey AS cur_id,
                   CAST(0 AS BIGINT) AS depth
            FROM orders
            UNION ALL
            SELECT w.root_id, w.cur_id // 3 AS cur_id, w.depth + 1
            FROM walk w
            WHERE w.cur_id >= 3 AND w.depth < 25
        )
        SELECT root_id, cur_id AS terminal_id, depth
        FROM (
            SELECT *, row_number() OVER (PARTITION BY root_id
                                         ORDER BY depth DESC) AS rn
            FROM walk
        ) WHERE rn = 1
    """,
    group="lineage",
)
def lineage_walk_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded-depth provenance walk via ``WITH RECURSIVE`` — desdb's
    srclist ``parentid`` recursion (§2A A7) in its fully declarative form,
    differentially checked because DuckDB runs the SAME recursive CTE.

    The fixtures have no self-referencing table, so the parent relation is
    derived deterministically from orders (parent(k) = k div 3, terminal
    below 3 — chains ~log₃(max key) ≈ 10 deep at sf0.1). The walk
    resolves every order key to its terminal ancestor with the hop count.

    Scale shape: Spark plans recursion as iterated joins with an AQE
    re-plan per step — each iteration shuffles only the surviving
    frontier, which shrinks geometrically here; depth is capped (25) the
    same way desdb's client loop bounded its IN-list recursion. The
    final per-root max-depth row is one hash aggregate.
    """
    from desdb_spark.session import load_table

    # Spark guards runaway recursion with cteRecursionRowLimit (default
    # 1e6 TOTAL rows across iterations); this walk materializes
    # |orders| × ~log₃(max key) rows (~1.6M at sf0.1), so size the safety
    # valve to the workload instead of silently truncating: at any scale
    # the bound is |roots| × max_depth, which the caller knows.
    # Raise the valve only for THIS query, then put it back — leaving it
    # at 200M on the shared session would disable the runaway-recursion
    # guard for every later recursive query.
    limit_key = "spark.sql.cteRecursionRowLimit"
    prior = spark.conf.get(limit_key, None)
    spark.conf.set(limit_key, str(200_000_000))
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_lw_orders")
    try:
        walked = spark.sql(
            """
        WITH RECURSIVE walk (root_id, cur_id, depth) AS (
            SELECT o_orderkey AS root_id, o_orderkey AS cur_id,
                   CAST(0 AS BIGINT) AS depth
            FROM _lw_orders
            UNION ALL
            SELECT w.root_id, w.cur_id div 3 AS cur_id, w.depth + 1
            FROM walk w
            WHERE w.cur_id >= 3 AND w.depth < 25
        )
        SELECT root_id, cur_id AS terminal_id, depth
        FROM (
            SELECT *, row_number() OVER (PARTITION BY root_id
                                         ORDER BY depth DESC) AS rn
            FROM walk
        ) WHERE rn = 1
        """
        )
        # Execute the recursion NOW, while the valve is raised: the conf
        # is read at execution time, so a lazy return would run under
        # whatever limit the session has by the time the caller collects.
        # The checkpoint truncates lineage, making the returned frame
        # independent of the restored conf.
        return walked.localCheckpoint(eager=True)
    finally:
        if prior is None:
            spark.conf.unset(limit_key)
        else:
            spark.conf.set(limit_key, prior)


def lineage_walk_loop(
    edges: DataFrame, roots: DataFrame, max_depth: int = 20
) -> DataFrame:
    """Driver-loop form of the A7 walk — desdb's control flow, distributed.

    Each iteration joins the unresolved frontier against the edge table
    (one Spark job), exactly like desdb's per-step IN-list query but
    cluster-parallel. localCheckpoint keeps the plan from growing
    exponentially across iterations.
    """
    edges = edges.select(
        F.col("id").alias("e_id"), F.col("parent_id").alias("e_parent")
    )
    frontier = roots.select(
        F.col("id").alias("root_id"), F.col("id").alias("cur_id"), F.lit(0).alias("depth")
    )
    resolved: DataFrame | None = None
    for _ in range(max_depth):
        stepped = frontier.join(
            edges, frontier.cur_id == edges.e_id, "left"
        ).select(
            "root_id",
            F.coalesce("e_parent", "cur_id").alias("cur_id"),
            F.when(F.col("e_parent").isNotNull(), F.col("depth") + 1)
            .otherwise(F.col("depth"))
            .alias("depth"),
            F.col("e_parent").isNull().alias("done"),
        ).localCheckpoint(eager=True)
        newly_done = stepped.where("done").drop("done")
        resolved = newly_done if resolved is None else resolved.unionByName(newly_done)
        frontier = stepped.where("NOT done").drop("done")
        if frontier.isEmpty():
            break
    out = frontier.unionByName(resolved) if resolved is not None else frontier
    return out.select("root_id", F.col("cur_id").alias("terminal_id"), "depth")
