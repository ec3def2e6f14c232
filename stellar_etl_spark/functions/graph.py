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


# --- integer-exact PageRank (fixed iterations) -------------------------------

PR_SCALE = 1_000_000  # ranks in micro-units
PR_DAMP_NUM = 85      # damping 0.85 as the exact rational 85/100
PR_DAMP_DEN = 100
PR_ITERS = 5


def pagerank(
    edges: DataFrame,
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Weighted PageRank over a (src, dst, w) edge list with EVERY
    operation in BIGINT arithmetic — floor-divided contributions and
    damping — so a fixed iteration count yields bit-identical ranks in
    any engine and under any partitioning/summation order (integer
    addition is commutative; double PageRank is not reproducible
    cross-engine). Dangling mass leaks (the standard 'leaked' variant):
    deterministic, and irrelevant for ranking comparisons.

    Per iteration: contribution src->dst = (r(src) * w) div out_w(src);
    r'(v) = (scale*(den-num)) div den + (num * sum_in(v)) div den.

    Scale notes (100 TB): per-round cost is one edges⋈ranks equi-join
    (ranks are node-dimension-sized — broadcast when the node set fits,
    shuffle on src otherwise) plus one dst-keyed map-side-combinable
    sum; lineage is truncated per round (localCheckpoint — the
    connected_components discipline), so the plan never grows with
    iteration count. Iteration count is fixed, not convergence-tested:
    rank deltas are monotone-bounded and 5 rounds is the standard
    curation-signal depth; a fixpoint loop would re-introduce the
    cross-engine float-tolerance problem fixed iterations avoid."""
    e = edges.select("src", "dst", F.col("w").cast("long").alias("w"))
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    e = e.join(outw, "src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    base = (scale * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    r = nodes.withColumn("r", F.lit(scale).cast("long"))
    for _ in range(iters):
        inr = (
            e.join(F.broadcast(r.withColumnRenamed("node", "src")), "src")
            .withColumn("c", F.expr("(r * w) div ow"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("inr"))
        )
        r = (
            nodes.join(inr, "node", "left")
            .withColumn(
                "r",
                F.lit(base).cast("long")
                + F.expr(f"({PR_DAMP_NUM} * coalesce(inr, 0L)) div {PR_DAMP_DEN}"),
            )
            .select("node", "r")
            .localCheckpoint(eager=True)
        )
    return r.select("node", F.col("r").cast("long").alias("rank"))


def pagerank_oracle_ctes(
    edges_cte_name: str,
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
) -> str:
    """Unrolled DuckDB CTE chain mirroring pagerank() iteration-for-
    iteration (recursive CTEs cannot re-aggregate per round, so the
    fixed depth is written out). Expects `{edges_cte_name}(src, dst,
    w)` in scope; ends defining `prfinal(node, r)`."""
    base = (scale * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    parts = [
        f"""
    , prout AS (SELECT src, SUM(w) AS ow FROM {edges_cte_name} GROUP BY src)
    , pre AS (SELECT e.src, e.dst, e.w, o.ow
              FROM {edges_cte_name} e JOIN prout o ON o.src = e.src)
    , prnodes AS (
        SELECT DISTINCT node FROM (
          SELECT src AS node FROM {edges_cte_name}
          UNION ALL SELECT dst FROM {edges_cte_name}
        )
    )
    , pr0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM prnodes)"""
    ]
    for i in range(1, iters + 1):
        parts.append(f"""
    , pr{i} AS (
        SELECT n.node,
               CAST({base} + ({PR_DAMP_NUM} * COALESCE(s.inr, 0))
                    // {PR_DAMP_DEN} AS BIGINT) AS r
        FROM prnodes n
        LEFT JOIN (
          SELECT e.dst AS node, SUM((r.r * e.w) // e.ow) AS inr
          FROM pre e JOIN pr{i - 1} r ON r.node = e.src
          GROUP BY e.dst
        ) s ON s.node = n.node
    )""")
    parts.append(f"\n    , prfinal AS (SELECT node, r FROM pr{iters})")
    return "".join(parts)
