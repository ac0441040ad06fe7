"""Connected components over near-duplicate pair sets — the clustering
stage of the dedup story (north-star surface; the reference stops at
pairwise similarity edges, e.g. RetweetTagsJaccardGraph.py:177-183, and
never groups them).

A dedup pipeline that emits *pairs* is unfinished: to actually drop
duplicates you need each document's duplicate *cluster* and one
canonical survivor per cluster. Components-of-pairs is exactly that.

Design for 100 TB:
- iterative **min-label propagation with pointer jumping** (label
  doubling). Near-dup graphs are unions of shallow star/clique-shaped
  clusters, so propagation alone converges in 1-2 rounds; pointer
  jumping bounds pathological chains at O(log n) rounds (same shape as
  the large-star/small-star MapReduce algorithm of Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14).
- each round is two equi-joins + a groupBy-min, all shuffle-partitioned
  by node/label id. Nothing per-row ever reaches the driver — the loop
  condition is a scalar "any label changed?" count.
- both join sides are corpus-sized, so the shuffle-hash strategy is
  pinned (a size misestimate must never broadcast a per-node table).
- lineage is truncated every round with ``localCheckpoint`` — without
  it the plan doubles per iteration and the driver, not the data,
  becomes the bottleneck. On a real cluster prefer reliable
  ``checkpoint()`` with a checkpoint dir (localCheckpoint ties the
  result to executor lifetime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component is the
    minimum node id reachable from the node (undirected).

    Converges when no label changes; raises if ``max_iter`` rounds were
    not enough (monotone-decreasing labels make the fixpoint the true
    component minimum, so a clean exit is a correctness proof, not a
    heuristic stop).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # min label over the neighborhood (node itself included below)
        nbr_min = (
            sym.hint("SHUFFLE_HASH")
            .join(
                labels.select(F.col("node").alias("b"), "label").hint("SHUFFLE_HASH"),
                "b",
            )
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = (
            labels.hint("SHUFFLE_HASH")
            .join(nbr_min.hint("SHUFFLE_HASH"), "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        # pointer jumping: node -> label -> label(label), halves chain depth
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        jumped = (
            stepped.hint("SHUFFLE_HASH")
            .join(
                parent.hint("SHUFFLE_HASH"),
                stepped.label == parent.p_node,
                "left",
            )
            .select("node", F.coalesce("p_label", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def canonical_survivors(
    docs: DataFrame,
    pair_edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Full-corpus dedup verdict: (id, component, keep).

    Every document gets its duplicate-cluster label (its own id when it
    has no near-dup partner) and a ``keep`` flag — true iff it is the
    cluster's minimum id. Downstream, ``WHERE keep`` is the deduped
    corpus. The left join is doc-table-sized on the left and
    components-of-paired-docs on the right (usually a small fraction),
    so AQE may broadcast the right side — that is fine and scale-safe:
    only *paired* docs appear there, not the corpus.
    """
    comp = connected_components(pair_edges, src=src, dst=dst).select(
        F.col("node").alias(id_col), F.col("label").alias("component")
    )
    out_component = F.coalesce(F.col("component"), F.col(id_col))
    return (
        docs.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            out_component.alias("component"),
            (out_component == F.col(id_col)).alias("keep"),
        )
    )
