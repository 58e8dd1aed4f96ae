"""Connected components over near-dup pairs → dedup clusters.

A training-data dedup pipeline doesn't stop at candidate PAIRS: a
near-dup relation is transitive in practice (a~b, b~c ⇒ keep one of
{a,b,c}), so the canonical-document choice needs the connected
component of each doc in the pair graph.  This is the classic
iterative-Spark shape the reference has no analog for:

* min-label propagation: every node repeatedly adopts the smallest
  label among itself and its neighbors; converges in O(diameter)
  rounds (near-dup clusters are shallow — a handful of rounds).
* each round is one shuffle (message groupBy); ``localCheckpoint``
  truncates the lineage per round — without it the plan doubles every
  iteration and the driver dies planning round ~15 (the canonical
  iterative-DataFrame pitfall).
* convergence is an exact count of changed labels; a ``max_iter`` cap
  bounds pathological chains.

At 10^10-doc scale each round shuffles |edges| messages — the same
cost class as one LSH band join, and the edge set (near-dup pairs) is
orders of magnitude smaller than the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 20,
) -> DataFrame:
    """pairs(a, b) → (node, component): component = min node id
    reachable through the undirected pair graph."""
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionByName(
            pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        msgs = (
            edges.join(labels, edges["u"] == labels["node"])
            .select(F.col("v").alias("node"), "component")
            .groupBy("node")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(msgs, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                (
                    F.coalesce("nbr_min", F.col("component"))
                    < F.col("component")
                ).alias("_changed"),
            )
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
        n_changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if n_changed == 0:
            break
    return labels


def canonical_docs(
    pairs: DataFrame, a_col: str = "a_id", b_col: str = "b_id"
) -> DataFrame:
    """pairs → (doc_id, canonical_id): every doc in a near-dup cluster
    maps to the cluster's min doc id (the keep-one dedup decision);
    docs that appear in no pair are their own canonical doc and are
    simply absent here (identity mapping needs no rows)."""
    comp = connected_components(pairs, a_col, b_col)
    return comp.select(
        F.col("node").alias("doc_id"), F.col("component").alias("canonical_id")
    )
