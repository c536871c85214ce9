"""Iterative graph operators: connected components for dedup clusters.

After near-dup pair mining (operators/dedup.py), production pipelines
collapse the pair list into duplicate CLUSTERS and keep one canonical
document per cluster — transitively: if A~B and B~C, then {A,B,C} is
one cluster even though A,C were never compared.  That is connected
components over the pair graph.

Implementation: distributed label propagation with pointer jumping —
each iteration a node takes the min of (its label, its neighbors'
labels, its label's label).  The neighbor step moves information one
hop; the pointer-jump (label-of-label) halves path lengths, giving
O(log n) iterations on chains instead of O(n) — the standard
large-star/small-star contraction idea in its simplest form.  Each
iteration is two key-partitioned shuffles over O(E) + O(V) rows; no
driver-side data, only an O(1) scalar per iteration (the label sum),
so the loop scales to any graph that fits the cluster.

Two Spark-specific lessons are load-bearing here (measured):

* **Lineage must be truncated every iteration.**  Each step references
  the previous labels frame three times (neighbor join, pointer jump,
  and itself), so the logical plan TRIPLES per iteration — ``persist``
  caches data but Catalyst still re-analyzes the whole tree, and by
  ~10 iterations even printing the plan OOMs the driver.
  ``localCheckpoint(eager=True)`` materializes AND cuts the plan.  On
  a real cluster with executor churn, set a checkpoint dir and use
  reliable ``checkpoint()`` instead (same call shape).
* **Convergence is a scalar, not a join.**  Labels only ever decrease,
  so the global ``sum(label)`` is strictly decreasing until fixpoint —
  comparing two driver-side scalars replaces a whole-frame
  changed-row join per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """(node, component) for every edge endpoint; component = min node
    id in the connected component.  Isolated nodes (no edges) are the
    caller's concern — left-join and coalesce to self.

    Converges when no label changes; raises if max_iter is hit first
    (a diagnostic, not silent wrong answers)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()  # materialized once, plan truncated
    )

    # Size the loop's shuffle width to the GRAPH, not the session: the
    # dup graph is orders of magnitude smaller than the corpus it came
    # from (hundreds of pairs per 5k docs here), and an iterative loop
    # pays the per-partition task overhead EVERY iteration — under a
    # default 200-partition session, ~15 iterations x 3 shuffles x 200
    # tasks is pure scheduling overhead on near-empty partitions.
    # ~500k edges per partition keeps partitions executor-sized at any
    # scale; the conf is restored after the loop.
    #
    # CONCURRENCY NOTE (ADVICE r4): the width override is session conf,
    # so any query running concurrently on the same SparkSession during
    # the loop inherits the reduced width — this operator assumes the
    # single-query-at-a-time usage every catalog entry follows.  (A
    # per-frame repartition() cannot replace the conf: join/groupBy
    # output width comes from the session setting, and AQE coalescing
    # only shrinks, never caps, the 3 shuffles per iteration.)
    spark = edges.sparkSession
    n_edges = sym.count()  # cheap: sym is checkpointed
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        session_parts = int(old_parts)
    except (TypeError, ValueError):  # e.g. unset/"auto" under a custom session
        session_parts = spark.sparkContext.defaultParallelism
    loop_parts = max(2, min(session_parts, 2 + n_edges // 500_000))
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        labels = (
            sym.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
            .localCheckpoint()
        )
        # decimal(38,0) keeps the convergence scalar overflow-proof at
        # any node-count × id-magnitude (ANSI mode would throw on long
        # overflow)
        label_sum = F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        prev_sum = labels.agg(label_sum).first()["s"]

        for _ in range(max_iter):
            nbr_min = (
                sym.join(labels, sym["b"] == labels["node"])
                .groupBy("a")
                .agg(F.min("label").alias("nbr_label"))
            )
            lab2 = labels.select(
                F.col("node").alias("j_node"), F.col("label").alias("jump_label")
            )
            labels = (
                labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
                .join(lab2, labels["label"] == lab2["j_node"], "left")
                .select(
                    "node",
                    F.least("label", "nbr_label", "jump_label").alias("label"),
                )
                .localCheckpoint()
            )
            new_sum = labels.agg(label_sum).first()["s"]
            if new_sum == prev_sum:
                return labels
            prev_sum = new_sum
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")
