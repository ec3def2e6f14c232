"""Distributed connected components over an edge list.

The dedup operators (`dedup.py`) emit *pairs* — but a curation
pipeline needs *clusters*: every document mapped to one canonical
representative so the keep/drop decision is transitive (a~b, b~c
=> a,b,c share one representative even when the a~c pair was never
generated). The reference's single-process analog is the seen-map
that folds each new match into the first-seen id
(/root/reference/cmd/export_assets.go:40-58); at 10^12 rows that
fold must be a distributed fixpoint instead.

Algorithm: hash-min label propagation with pointer jumping
(the HashMin/star-contraction family — Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14). Each round:

1. every node takes the min of its own label and its neighbors'
   labels (one shuffle: edges join labels, then min-agg by node);
2. pointer jumping: ``lbl(v) <- lbl(lbl(v))`` (one more equi-join),
   which short-circuits chains so convergence is O(log d) rounds in
   the component diameter d instead of O(d).

Scale notes (100 TB):
* per-round cost is two shuffles on bounded-size tables — the label
  table has one row per *node that appears in a dup pair*, which for
  dedup workloads is a small fraction of the corpus (and orders of
  magnitude smaller than the corpus bytes: two longs per row);
* labels only ever decrease, so convergence is detected with a
  single ``SUM(lbl)`` aggregate per round (monotone fixpoint) — no
  row-by-row diff join;
* every round ends in ``localCheckpoint(eager=True)`` to truncate
  lineage (the iterative-plan blowup trap); on a real cluster this
  is a checkpoint to the cluster store, same role;
* dedup graphs are unions of near-cliques (tiny diameter), so the
  loop exits after 2-3 rounds in practice; ``max_iter`` is a
  backstop, and hitting it raises rather than silently returning a
  non-converged labeling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(node, rep) for every node appearing in `edges`, where rep is
    the minimum node id in the node's connected component.

    `edges` is treated as undirected; either orientation may appear.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    lbl = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = lbl.agg(F.sum("lbl")).collect()[0][0]
    if prev_sum is None:  # empty edge set
        return lbl.select("node", F.col("lbl").alias("rep"))

    for _ in range(max_iter):
        # 1. hash-min: each node <- min(own label, neighbor labels)
        nbr = sym.join(
            lbl.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "lbl")
        new = (
            nbr.union(lbl)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
        # 2. pointer jumping: lbl(v) <- lbl(lbl(v)). Every label IS a
        # node id (mins of node ids), so the self-join is total; the
        # left join + coalesce guards the root (lbl(r) = r) case.
        jump = new.select(F.col("node").alias("lbl"), F.col("lbl").alias("lbl2"))
        lbl = (
            new.join(jump, "lbl", "left")
            .select("node", F.coalesce("lbl2", "lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        # labels are node ids and only ever decrease, so SUM(lbl) is a
        # strictly decreasing convergence measure (cheap: one agg, no
        # row-diff join)
        cur_sum = lbl.agg(F.sum("lbl")).collect()[0][0]
        if cur_sum == prev_sum:
            return lbl.select("node", F.col("lbl").alias("rep"))
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def cc_reach_oracle_cte(edges_cte_name: str = "edges") -> str:
    """DuckDB recursive-CTE fragment computing the same (node, rep)
    labeling as `connected_components` — the min node id reachable
    from each node — for oracle comparison at test scale. The closure
    enumerates (node, reachable-node) pairs, so it is O(sum |C|^2)
    over components: exact and fine at SF<=0.1, never the 100 TB
    plan (that is what the Spark fixpoint above is for).

    Expects `{edges_cte_name}` with columns (src, dst), either
    orientation. Must be placed inside a WITH RECURSIVE chain.
    Produces CTEs `cc_sym`, `cc_reach`, `cc_reps(node, rep)`.

    `cc_sym` is forced MATERIALIZED: DuckDB otherwise inlines
    non-recursive CTEs into the recursive term, re-evaluating the
    entire upstream pair pipeline once per fixpoint iteration.
    """
    e = edges_cte_name
    return f"""cc_sym AS MATERIALIZED (
  SELECT src, dst FROM {e} WHERE src <> dst
  UNION
  SELECT dst AS src, src AS dst FROM {e} WHERE src <> dst
),
cc_reach(node, lbl) AS (
  SELECT src AS node, src AS lbl FROM cc_sym
  UNION
  SELECT s.dst AS node, r.lbl
  FROM cc_reach r JOIN cc_sym s ON s.src = r.node
),
cc_reps AS (
  SELECT node, MIN(lbl) AS rep FROM cc_reach GROUP BY node
)"""
