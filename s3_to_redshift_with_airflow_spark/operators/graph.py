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


def pagerank_scaled(
    edges: DataFrame,
    n_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
    scale: int = 1_000_000,
    damping_ppm: int = 850_000,
) -> DataFrame:
    """Integer-scaled PageRank: (node, rank) after `n_iter` power
    iterations, where rank is the stationary-probability estimate times
    N·scale (every node starts at exactly `scale`; ranks stay comparable
    across nodes, which is all centrality ranking needs).

    Update rule (all bigint, floor division — deterministic on any engine
    or partitioning, which is what lets a PAGERANK carry an exact value
    oracle, same design as clustering.kmeans_int8):

        contrib(u)  = rank(u) div outdeg(u)
        rank'(v)    = (scale − damping_ppm)
                      + (damping_ppm · Σ_{u→v} contrib(u)) div scale

    This is the classic damped update with (1−d) = 0.15 expressed in
    parts-per-million. Dangling nodes (no out-edges) leak their rank —
    the standard "no dangling redistribution" variant; symmetrize the
    edge list (every near-dup pair graph is symmetric) to avoid them.
    Rounding: each iteration floors twice, so ranks are exact integers,
    biased ≤ 1 scale-unit low per iteration — irrelevant at scale=1e6.

    Overflow: Σ contrib ≤ N·scale, so the damped product stays inside
    int64 while N·scale·damping_ppm < 2^63 — N under ~10⁷ nodes at the
    defaults. For larger graphs lower `scale` (1e4 keeps 4 significant
    digits up to N ~ 10⁹) — noted so the bound fails in review, not
    silently (ANSI mode, the Spark 4 default, makes overflow loud).

    Scale shape: per iteration, one groupBy(dst) shuffle of partial
    contribution sums; outdegree computed once and joined broadcast-or-
    shuffle as the optimizer picks. The deduplicated edge table is
    MATERIALIZED once up front (eager localCheckpoint — blocks are
    ContextCleaner-freed once unreferenced, no session-lifetime cache
    pin): every iteration references it, and without materialization the
    edge-derivation subtree (typically a scan + distinct shuffle) would
    re-execute ~3× per iteration. The rank lineage itself stays lazy (no
    per-iteration checkpoint needed at single-digit n_iter; for deep
    iteration or executor-loss safety at cluster scale reuse
    connected_components' reliable-checkpoint pattern).
    """
    if n_iter <= 0 or scale <= 0 or not (0 < damping_ppm < scale):
        raise ValueError("need n_iter > 0, scale > 0, 0 < damping_ppm < scale")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
    )
    base = scale - damping_ppm
    rank = nodes.withColumn("rank", F.lit(scale).cast("bigint"))
    for _ in range(n_iter):
        contrib = (
            e.join(rank, e.u == rank.node)
            .join(deg, "u")
            .select(F.col("v"), F.expr("`rank` div outdeg").alias("contrib"))
            .groupBy("v")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        rank = (
            nodes.join(contrib, nodes.node == contrib.v, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_ppm} * coalesce(in_sum, 0)) div {scale}"
                    )
                ).cast("bigint").alias("rank"),
            )
        )
    return rank
