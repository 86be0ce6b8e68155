"""Hierarchy closure via pointer doubling.

Warehouse dimensions are often hierarchical (domain -> site -> page,
org trees, category taxonomies) and the query "roll every node up to
its root" is a transitive closure — SQL engines spell it WITH
RECURSIVE, which Spark does not have. The naive port iterates
one-parent-hop-per-round: O(depth) shuffle joins. This implements
*pointer doubling* (path halving, the same trick the dedup
connected-components operator uses for its large-star rounds,
operators/dedup.py): each round composes the current ancestor map
with itself, doubling the resolved path length, so a depth-d
hierarchy closes in ceil(log2 d) self-joins instead of d.

Scale posture: every round is one self-equi-join of the (node,
ancestor, depth) map, hash-partitioned on the join key; the map never
grows (exactly one row per node). ``localCheckpoint`` after each
round truncates the doubling lineage so round k's plan is O(1), not
O(2^k). A depth-20 hierarchy at 10^10 nodes is 5 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def closure_to_root(
    nodes: DataFrame,
    node: str,
    parent: str,
    *,
    max_rounds: int = 20,
    checkpoint: bool = True,
) -> DataFrame:
    """Resolve every node to its root ancestor and depth.

    ``nodes`` has one row per node with its parent; a ROOT is a row
    whose ``parent`` is null (or equals the node itself). Returns
    ``(node, root, depth)`` where depth counts edges to the root.

    Raises after ``max_rounds`` doublings (covers depth 2^20) so a
    parent cycle fails loudly instead of looping forever.
    """
    is_root = F.col(parent).isNull() | (F.col(parent) == F.col(node))
    cur = nodes.select(
        F.col(node).alias("node"),
        F.when(is_root, F.col(node)).otherwise(F.col(parent)).alias("anc"),
        F.when(is_root, F.lit(0)).otherwise(F.lit(1)).alias("depth"),
    )
    roots = nodes.filter(is_root).select(F.col(node).alias("_root"))

    for _ in range(max_rounds):
        # Done when every ancestor pointer lands on a root.
        pending = (
            cur.join(
                F.broadcast(roots), cur["anc"] == roots["_root"], "left_anti"
            ).limit(1).count()
        )
        if pending == 0:
            return cur.select(
                "node", F.col("anc").alias("root"), "depth"
            )
        hop = cur.select(
            F.col("node").alias("_j_node"),
            F.col("anc").alias("_j_anc"),
            F.col("depth").alias("_j_depth"),
        )
        cur = (
            cur.join(hop, cur["anc"] == hop["_j_node"], "inner")
            .select(
                "node",
                F.col("_j_anc").alias("anc"),
                (F.col("depth") + F.col("_j_depth")).alias("depth"),
            )
        )
        if checkpoint:
            cur = cur.localCheckpoint(eager=True)
    raise RuntimeError(
        f"closure_to_root: not converged after {max_rounds} doubling "
        "rounds — parent cycle, or raise max_rounds"
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    n_iter: int = 5,
    damping: float = 0.85,
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank: ``(node, rank)`` after ``n_iter``
    power steps with teleport ``(1-damping)/N`` — source-authority
    scoring for crawl curation (a page/domain's rank is a standard
    quality prior when selecting training documents).

    ``edges`` is ``(src, dst)``; ``nodes`` is one ``node`` row each.
    Contributions to ids absent from ``nodes`` drop (the web always
    has edges pointing off-corpus); dangling nodes contribute nothing
    (their mass leaks — the fixed-point still orders by authority).

    Scale shape: the out-degree table is computed ONCE and
    localCheckpointed (two consumers per round would otherwise rescan
    the edge set every iteration); each round is one edges-to-ranks
    equi-join + a keyed contribution sum + a nodes left join, all
    hash-partitioned on node ids, and the rank frame (one row per
    node) is localCheckpointed so round k's plan stays O(1) — the
    closure_to_root discipline. Cross-engine determinism: each
    contribution ``rank/outdeg`` is an IEEE double computed from
    identical inputs; the per-node sum runs in DECIMAL(38,18), so
    shuffle order can't move the result — a DuckDB oracle with the
    iterations unrolled matches bit-for-bit before the final
    rounding.
    """
    n = nodes.count()
    teleport = (1.0 - damping) / n
    if checkpoint:
        # The edge relation is STATIC across iterations but referenced
        # in every round's join — un-materialized, each round would
        # re-run its entire build subtree (scans, unions, filters).
        # One executor-storage materialization amortizes it over all
        # n_iter rounds.
        edges = edges.localCheckpoint(eager=True)
    outdeg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    dec = "decimal(38,18)"
    for _ in range(n_iter):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(outdeg.withColumnRenamed("node", "_dn"),
                  edges["src"] == F.col("_dn"))
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).cast(dec).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast(dec).alias("_in"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * F.coalesce(F.col("_in"), F.lit(0).cast(dec))
                    .cast("double")
                ).alias("rank"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
