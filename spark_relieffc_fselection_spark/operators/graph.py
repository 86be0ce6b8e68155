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
