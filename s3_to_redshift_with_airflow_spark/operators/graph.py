"""Graph operators: connected components over pair edges.

Near-dup detection yields PAIRS (dedup.py/similarity.py); turning pairs into
dedup groups ("keep one doc per component") is a connected-components
problem — the canonical iterative algorithm a declarative plan can't express
in one pass (SURVEY §2.13's cluster step; same algorithm family as
Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14).

Implementation: iterative min-label propagation. Each node starts labeled
with itself; every iteration each node takes the min of its own label and
its neighbors' labels; converged when no label changes. Iterations =
O(graph diameter) — near-dup graphs are unions of small cliques, so 2-3
iterations in practice. Each iteration is one shuffle (join + groupBy on
node); checkpointing truncates the growing lineage so iteration N's plan
does not replay iterations 1..N-1.

Checkpoint modes: the default `localCheckpoint` stores blocks on executors
— fast, but an executor loss mid-iteration kills the job with no recompute
path. At cluster scale pass `reliable=True` (with `checkpoint_dir` or a
pre-set `sparkContext.setCheckpointDir`) to stage each iteration to the
reliable checkpoint store (HDFS/S3/local FS) so the job survives executor
loss.

Determinism: the fixpoint (min reachable id per component) is unique —
independent of iteration order, partitioning, or cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    reliable: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Label each node with the smallest node id in its component.

    Returns (node, component). Nodes = every id appearing in `edges`.
    Raises if not converged within max_iter (diameter > max_iter).

    `reliable=True` uses reliable `checkpoint()` (persisted to the Spark
    checkpoint directory — survives executor loss) instead of the default
    executor-resident `localCheckpoint()`. Requires `checkpoint_dir` or a
    checkpoint dir already set on the SparkContext. Both modes produce the
    identical fixpoint — the choice is purely a fault-tolerance/speed trade.
    """
    sc = edges.sparkSession.sparkContext
    if reliable:
        if checkpoint_dir is not None:
            sc.setCheckpointDir(checkpoint_dir)
        elif not sc._jsc.sc().getCheckpointDir().isDefined():
            raise ValueError(
                "reliable=True needs checkpoint_dir or a prior "
                "sparkContext.setCheckpointDir(...)"
            )

    def _clean_superseded(keep_latest_only: bool = False) -> None:
        """Delete superseded iteration checkpoints. Spark never removes
        reliable checkpoint files on its own (absent the opt-in GC-driven
        cleaner conf), so at corpus scale each iteration would leave a full
        labels snapshot in the store. The effective checkpoint dir is
        context-private (setCheckpointDir appends a per-context UUID), and
        this engine checkpoints reliably only here, so every rdd-* entry in
        it belongs to this computation: keep the newest (current labels)
        plus — until convergence — the oldest (the edge table `sym`, read
        by every iteration), delete the rest."""
        jsc = sc._jsc.sc()
        if not jsc.getCheckpointDir().isDefined():
            return
        jvm = sc._jvm
        path = jvm.org.apache.hadoop.fs.Path(jsc.getCheckpointDir().get())
        fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
        if not fs.exists(path):
            return
        entries = [
            (int(st.getPath().getName()[4:]), st.getPath())
            for st in fs.listStatus(path)
            if st.getPath().getName().startswith("rdd-")
        ]
        entries.sort()
        keep = {entries[-1][0]} if entries else set()
        if not keep_latest_only and entries:
            keep.add(entries[0][0])
        for rdd_id, p in entries:
            if rdd_id not in keep:
                fs.delete(p, True)

    def ckpt(df: DataFrame) -> DataFrame:
        if not reliable:
            return df.localCheckpoint()
        out = df.checkpoint(eager=True)
        _clean_superseded()
        return out

    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = ckpt(sym.distinct())

    labels = ckpt(
        sym.select(F.col("u").alias("node")).distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
        )
        # Carry the previous label through the update so convergence is a
        # cheap filter-count on the checkpointed result — no extra
        # old-vs-new join per iteration.
        upd = ckpt(
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.col("component").alias("__old"),
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        changed = upd.filter(F.col("__old") != F.col("component")).count()
        labels = upd.select("node", "component")
        if changed == 0:
            if reliable:  # the edge table is no longer needed either
                _clean_superseded(keep_latest_only=True)
            return labels
    raise RuntimeError(f"connected_components: no convergence in {max_iter} iterations")
