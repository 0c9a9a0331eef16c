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

    # --- ownership-tracked reliable-checkpoint hygiene -------------------
    # Spark never removes reliable checkpoint files on its own (absent the
    # opt-in GC-driven cleaner conf), so at corpus scale each iteration
    # would leave a full labels snapshot in the store. We must clean up —
    # but ONLY the snapshots THIS invocation created: the checkpoint dir
    # may be shared with earlier calls, unrelated user code, or concurrent
    # invocations, and deleting their entries corrupts their lineage. So
    # each ckpt() diffs the dir's rdd-* entries around the checkpoint call
    # and records the new paths as owned; cleanup deletes only owned,
    # superseded label snapshots (the edge table is owned separately and
    # deleted at convergence). Concurrent invocations sharing one dir can
    # still race inside the diff window — pass each a distinct
    # checkpoint_dir to be fully isolated.
    def _fs_and_dir():
        jsc = sc._jsc.sc()
        if not jsc.getCheckpointDir().isDefined():
            return None, None
        path = sc._jvm.org.apache.hadoop.fs.Path(jsc.getCheckpointDir().get())
        fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
        return fs, path

    def _list_rdd_entries():
        fs, path = _fs_and_dir()
        if fs is None or not fs.exists(path):
            return {}
        return {
            st.getPath().getName(): st.getPath()
            for st in fs.listStatus(path)
            if st.getPath().getName().startswith("rdd-")
        }

    owned_label_ckpts: list = []  # this invocation's label snapshots, oldest first
    owned_edge_ckpts: list = []  # this invocation's edge-table snapshot(s)

    def _delete_paths(paths) -> None:
        fs, _ = _fs_and_dir()
        if fs is None:
            return
        for p in paths:
            if fs.exists(p):
                fs.delete(p, True)

    def ckpt(df: DataFrame, is_edges: bool = False) -> DataFrame:
        if not reliable:
            return df.localCheckpoint()
        before = set(_list_rdd_entries())
        out = df.checkpoint(eager=True)
        after = _list_rdd_entries()
        new_paths = [p for name, p in after.items() if name not in before]
        (owned_edge_ckpts if is_edges else owned_label_ckpts).extend(new_paths)
        # Keep only the newest of OUR label snapshots; prior iterations'
        # are superseded (nothing references them — each iteration reads
        # only the edge table and the latest labels).
        while len(owned_label_ckpts) > 1:
            _delete_paths([owned_label_ckpts.pop(0)])
        return out

    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = ckpt(sym.distinct(), is_edges=True)

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
            if reliable:
                # The edge table is no longer needed. The final labels
                # snapshot stays — it backs the returned DataFrame.
                _delete_paths(owned_edge_ckpts)
            return labels
    if reliable:  # nothing references our snapshots after the failure
        _delete_paths(owned_edge_ckpts + owned_label_ckpts)
    raise RuntimeError(f"connected_components: no convergence in {max_iter} iterations")
