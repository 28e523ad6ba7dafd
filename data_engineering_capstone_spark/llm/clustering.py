"""Connected components over a pair set — dedup CLUSTER formation
(SURVEY.md §2 C-llm-dedup: near-dup pairs → groups → one survivor).

Near-duplicate detection emits PAIRS; deduplication needs GROUPS
(transitive closure: if A~B and B~C, then {A,B,C} dedup together even
when A~C was never scored). This is the iterative-algorithm class the
engine must support beyond one-shot SQL shapes.

Algorithm: minimum-label propagation. Every node starts labeled with
itself; each round every node takes the min of its own and its
neighbors' labels; fixpoint = components. Rounds needed ≈ graph
diameter (near-dup clusters are shallow — a handful of rounds).

Scale notes: each round is one join + one aggregate on the edge list —
all distributed, nothing driver-side except the convergence counter.
Lineage is truncated every round with ``localCheckpoint`` (the classic
iterative-Spark requirement: without it the plan doubles per round and
the driver dies planning round 15). For web-scale graphs swap in the
alternating large/small-star algorithm; label propagation is optimal
for the shallow-cluster shape dedup produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every node in ``edges``; component = min node
    id reachable. Raises if not converged within ``max_iter``."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.v == labels.id)
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.u, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
                (F.col("nmin") < F.col("label")).alias("__changed"),
            )
        ).localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("__changed")).limit(1).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster view of a near-dup pair set: (doc_id, component, is_survivor)
    where the survivor is the minimum id of each component (deterministic
    keep-rule, same convention as exact_dedup)."""
    comp = connected_components(pairs, src, dst)
    return comp.select(
        F.col("id").alias("doc_id"),
        "component",
        (F.col("id") == F.col("component")).alias("is_survivor"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair set — the
    centrality diagnostic for dedup/similarity graphs (a high-rank node
    is a template hub: the page every near-duplicate points at).

    Power iteration, ``iterations`` rounds of
    ``rank = (1-d)/N + d * sum(rank_neighbor / deg_neighbor)``.
    Every round is one join + one aggregate over the edge list — fully
    distributed, only N on the driver; lineage truncated per round with
    ``localCheckpoint`` like :func:`connected_components`. Nodes are
    those appearing in edges (isolated nodes have no edges to walk, so
    symmetric graphs here have no dangling mass). Deterministic up to
    floating summation order; the differential test pins values against
    a sequential numpy power iteration at 1e-9.
    """
    # checkpoint first: sym feeds nodes AND adj — inline, the caller's
    # edge pipeline (e.g. the exact-Jaccard pair join) would execute twice
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    nodes = sym.select(F.col("u").alias("id")).distinct().localCheckpoint()
    n = nodes.count()
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("__deg"))
    adj = sym.join(deg, "u").localCheckpoint()
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contribs = (
            adj.join(ranks, adj["u"] == ranks["id"])
            .select(F.col("v").alias("id"), (F.col("rank") / F.col("__deg")).alias("__c"))
            .groupBy("id")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
