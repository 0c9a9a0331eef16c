"""Graph operators: connected components and PageRank over pair edges.

Near-dup detection yields PAIRS (dedup.py/similarity.py); turning pairs into
dedup groups ("keep one doc per component") is a connected-components
problem — the canonical iterative algorithm a declarative plan can't express
in one pass (SURVEY §2.13's cluster step; same algorithm family as
Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14).
PageRank is the centrality twin: same per-iteration shuffle shape, scored
instead of labeled.

Connected components: iterative min-label propagation. Each node starts
labeled with itself; every iteration each node takes the min of its own
label and its neighbors' labels; converged when no label changes.
Iterations = O(graph diameter) — near-dup graphs are unions of small
cliques, so 2-3 iterations in practice. Each iteration is one shuffle
(join + groupBy on node); checkpointing truncates the growing lineage so
iteration N's plan does not replay iterations 1..N-1.

Checkpoint modes (both operators): the default `localCheckpoint` stores
blocks on executors — fast, but an executor loss mid-iteration kills the
job with no recompute path. At cluster scale pass `reliable=True` (with
`checkpoint_dir` or a pre-set `sparkContext.setCheckpointDir`) to stage
iterations to the reliable checkpoint store (HDFS/S3/local FS) so the job
survives executor loss. Ownership-tracked cleanup (below) keeps the store
from accumulating superseded snapshots.

Determinism: CC's fixpoint (min reachable id per component) is unique —
independent of iteration order, partitioning, or cluster size. PageRank is
all-bigint floor division, equally partition-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class _OwnedCheckpoints:
    """Ownership-tracked reliable-checkpoint hygiene, shared by the
    iterative graph operators.

    Spark never removes reliable checkpoint files on its own (absent the
    opt-in GC-driven cleaner conf), so at corpus scale each iteration would
    leave a full snapshot in the store. We must clean up — but ONLY the
    snapshots THIS invocation created: the checkpoint dir may be shared
    with earlier calls, unrelated user code, or concurrent invocations, and
    deleting their entries corrupts their lineage. So each ckpt() diffs the
    dir's rdd-* entries around the checkpoint call and records the new
    paths as owned, per named slot; a slot keeps only its newest `keep`
    snapshots (prior iterations' are superseded — each iteration reads only
    the edge table and the latest state). Concurrent invocations sharing
    one dir can still race inside the diff window — pass each a distinct
    checkpoint_dir to be fully isolated.

    With reliable=False, ckpt() degrades to `localCheckpoint()` (eager,
    executor-resident, ContextCleaner-freed) and owns nothing.
    """

    def __init__(self, sc, reliable: bool, checkpoint_dir: str | None):
        self.sc = sc
        self.reliable = reliable
        if reliable:
            if checkpoint_dir is not None:
                sc.setCheckpointDir(checkpoint_dir)
            elif not sc._jsc.sc().getCheckpointDir().isDefined():
                raise ValueError(
                    "reliable=True needs checkpoint_dir or a prior "
                    "sparkContext.setCheckpointDir(...)"
                )
        self._owned: dict[str, list] = {}

    def _fs_and_dir(self):
        jsc = self.sc._jsc.sc()
        if not jsc.getCheckpointDir().isDefined():
            return None, None
        path = self.sc._jvm.org.apache.hadoop.fs.Path(jsc.getCheckpointDir().get())
        fs = path.getFileSystem(self.sc._jsc.hadoopConfiguration())
        return fs, path

    def _list_rdd_entries(self) -> dict:
        fs, path = self._fs_and_dir()
        if fs is None or not fs.exists(path):
            return {}
        return {
            st.getPath().getName(): st.getPath()
            for st in fs.listStatus(path)
            if st.getPath().getName().startswith("rdd-")
        }

    def _delete_paths(self, paths) -> None:
        fs, _ = self._fs_and_dir()
        if fs is None:
            return
        for p in paths:
            if fs.exists(p):
                fs.delete(p, True)

    def ckpt(self, df: DataFrame, slot: str, keep: int = 1) -> DataFrame:
        if not self.reliable:
            return df.localCheckpoint()
        before = set(self._list_rdd_entries())
        out = df.checkpoint(eager=True)
        after = self._list_rdd_entries()
        owned = self._owned.setdefault(slot, [])
        owned.extend(p for name, p in after.items() if name not in before)
        while len(owned) > keep:
            self._delete_paths([owned.pop(0)])
        return out

    def drop(self, *slots: str) -> None:
        for s in slots:
            self._delete_paths(self._owned.pop(s, []))

    def drop_all(self) -> None:
        self.drop(*list(self._owned))


def _require_ansi(df: DataFrame, allow_non_ansi: bool, what: str) -> None:
    """Bigint arithmetic wraps SILENTLY on overflow under non-ANSI mode, so
    refuse to build a plan that could be wrong without an error (same
    policy as clustering._require_ansi)."""
    if allow_non_ansi:
        return
    ansi = str(
        df.sparkSession.conf.get("spark.sql.ansi.enabled", "true")
    ).lower()
    if ansi != "true":
        raise ValueError(
            f"{what} requires spark.sql.ansi.enabled=true so a bigint "
            "overflow fails loudly instead of wrapping silently; enable "
            "ANSI mode or pass allow_non_ansi=True for graphs provably "
            "below the documented bound"
        )


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
    store = _OwnedCheckpoints(edges.sparkSession.sparkContext, reliable, checkpoint_dir)

    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = store.ckpt(sym.distinct(), "edges")

    labels = store.ckpt(
        sym.select(F.col("u").alias("node")).distinct()
        .withColumn("component", F.col("node")),
        "labels",
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
        upd = store.ckpt(
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.col("component").alias("__old"),
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            ),
            "labels",
        )
        changed = upd.filter(F.col("__old") != F.col("component")).count()
        labels = upd.select("node", "component")
        if changed == 0:
            # The edge table is no longer needed. The final labels snapshot
            # stays — it backs the returned DataFrame.
            store.drop("edges")
            return labels
    store.drop_all()  # nothing references our snapshots after the failure
    raise RuntimeError(f"connected_components: no convergence in {max_iter} iterations")


def pagerank_scaled(
    edges: DataFrame,
    n_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
    scale: int = 1_000_000,
    damping_ppm: int = 850_000,
    redistribute_dangling: bool = False,
    reliable: bool = False,
    checkpoint_dir: str | None = None,
    ckpt_every: int = 0,
    allow_non_ansi: bool = False,
) -> DataFrame:
    """Integer-scaled PageRank: (node, rank) after `n_iter` power
    iterations, where rank is the stationary-probability estimate times
    N·scale (every node starts at exactly `scale`; ranks stay comparable
    across nodes, which is all centrality ranking needs).

    Update rule (all bigint, floor division — deterministic on any engine
    or partitioning, which is what lets a PAGERANK carry an exact value
    oracle, same design as clustering.kmeans_int8):

        contrib(u)  = rank(u) div outdeg(u)
        share       = (Σ_{u dangling} rank(u)) div N    if redistribute_dangling else 0
        rank'(v)    = (scale − damping_ppm)
                      + (damping_ppm · (Σ_{u→v} contrib(u) + share)) div scale

    This is the classic damped update with (1−d) = 0.15 expressed in
    parts-per-million. By default dangling nodes (no out-edges) leak their
    rank — the standard "no dangling redistribution" variant; symmetrize
    the edge list (every near-dup pair graph is symmetric) to avoid them.
    `redistribute_dangling=True` adds the textbook uniform-redistribution
    term instead: one extra 1-row bigint aggregate (read on the driver,
    exact) per iteration, still all-integer, so determinism is unchanged.
    On a symmetric graph the dangling set is empty and both modes are
    bit-identical. Rounding: each iteration floors (twice, plus once for
    `share`), so ranks are exact integers, biased ≤ 1 scale-unit low per
    floor — irrelevant at scale=1e6.

    Overflow: Σ contrib + share ≤ N·scale, so the damped product stays
    inside int64 while N·scale·damping_ppm < 2^63 — N under ~10⁷ nodes at
    the defaults. For larger graphs lower `scale` (1e4 keeps 4 significant
    digits up to N ~ 10⁹). Non-ANSI sessions would wrap silently past the
    bound, so the plan REFUSES to build unless ANSI mode is on (the Spark 4
    default) or the caller passes `allow_non_ansi=True` for graphs provably
    below it — same policy as clustering.kmeans_int8.

    Scale shape: per iteration, one groupBy(dst) shuffle of partial
    contribution sums; outdegree computed once and joined broadcast-or-
    shuffle as the optimizer picks. The deduplicated edge table is
    MATERIALIZED once up front: every iteration references it, and without
    materialization the edge-derivation subtree (typically a scan +
    distinct shuffle) would re-execute ~3× per iteration. By default that
    is an eager `localCheckpoint` (blocks ContextCleaner-freed once
    unreferenced, no session-lifetime cache pin) and the rank lineage
    stays lazy — fine at single-digit n_iter on a healthy cluster. For
    executor-loss safety pass `reliable=True` (+ `checkpoint_dir`): the
    edge table and the final ranks stage to the reliable checkpoint store
    via the same ownership-tracked cleanup as connected_components, and
    `ckpt_every=k` additionally snapshots the ranks every k iterations
    (keeping only the newest) so deep iteration neither replays lineage
    nor floods the store. Both modes produce bit-identical ranks.
    """
    if n_iter <= 0 or scale <= 0 or not (0 < damping_ppm < scale):
        raise ValueError("need n_iter > 0, scale > 0, 0 < damping_ppm < scale")
    if ckpt_every < 0:
        raise ValueError("ckpt_every must be >= 0")
    _require_ansi(edges, allow_non_ansi, "pagerank_scaled")
    store = _OwnedCheckpoints(edges.sparkSession.sparkContext, reliable, checkpoint_dir)
    e0 = store.ckpt(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct(),
        "edges0",
    )
    # The outdegree join and the node set are LOOP-INVARIANT, but left
    # lazy they re-derive from the edge snapshot inside every iteration's
    # lineage (measured: the 3-iteration registry row re-ran the
    # deg-groupBy and nodes-distinct shuffles 3x each — 28 edge-snapshot
    # scans, zero exchange reuse). Annotate each edge with its source's
    # outdegree ONCE and snapshot the node set, so each iteration is
    # exactly one rank join + one groupBy(v) shuffle + the nodes left
    # join (guide §2.4: remove whole shuffles). The plain edge snapshot
    # is superseded by the annotated one and dropped immediately.
    deg = e0.groupBy("u").agg(F.count(F.lit(1)).alias("outdeg"))
    e = store.ckpt(e0.join(deg, "u"), "edges")  # (u, v, outdeg)
    nodes = store.ckpt(
        e0.select(F.col("u").alias("node"))
        .unionByName(e0.select(F.col("v").alias("node")))
        .distinct(),
        "nodes",
    )
    store.drop("edges0")
    if redistribute_dangling:
        # Dangling set and N are loop-invariant; their ranks change per
        # iteration, so only the 1-row sum re-executes inside the loop.
        # (A dangling node is one that never appears as an edge source.)
        dangling = nodes.join(e, nodes.node == e.u, "left_anti")
        n_nodes = nodes.count()
    base = scale - damping_ppm
    rank = nodes.withColumn("rank", F.lit(scale).cast("bigint"))
    for it in range(n_iter):
        if redistribute_dangling:
            # Materialize the ranks BEFORE the per-iteration 1-row driver
            # aggregate: the collect executes the full rank lineage anyway,
            # so snapshotting it here is free compute-wise, and without it
            # the collect at iteration t replays iterations 1..t-1 from
            # scratch — O(n_iter²) stage replays (ADVICE r5). The same
            # snapshot then feeds the contribution join, so each iteration
            # runs exactly once in both checkpoint modes.
            if it > 0:
                rank = store.ckpt(rank, "rank")
            row = (
                rank.join(dangling, "node", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("s"))
                .collect()[0]  # 1-row exact bigint aggregate, sanctioned
            )
            share = int(row["s"]) // n_nodes
        else:
            share = 0
        contrib = (
            e.join(rank, e.u == rank.node)
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
                        f"({damping_ppm} * (coalesce(in_sum, 0) + {share})) "
                        f"div {scale}"
                    )
                ).cast("bigint").alias("rank"),
            )
        )
        if ckpt_every and (it + 1) % ckpt_every == 0 and it + 1 < n_iter:
            rank = store.ckpt(rank, "rank")
    if reliable:
        # Materialize the final ranks so the edge/node snapshots (which the
        # lazy rank lineage references) can be dropped from the store; the
        # final rank snapshot stays — it backs the returned DataFrame.
        rank = store.ckpt(rank, "rank")
        store.drop("edges", "nodes")
    return rank


def personalized_pagerank(
    edges: DataFrame,
    seeds: list[str] | DataFrame,
    n_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    scale: int = 1_000_000,
    damping_ppm: int = 850_000,
    reliable: bool = False,
    checkpoint_dir: str | None = None,
    ckpt_every: int = 0,
    allow_non_ansi: bool = False,
) -> DataFrame:
    """Personalized (seed-anchored) PageRank — the query-time variant of
    pagerank_scaled: teleport mass returns only to the SEED set, so ranks
    measure proximity to the seeds (Haveliwala 2002; the similar-items /
    who-to-follow recommender primitive), not global centrality.

        rank_0(v)   = scale · [v ∈ S]
        rank'(v)    = (scale − damping_ppm)·[v ∈ S]
                      + (damping_ppm · Σ_{u→v} rank(u) div outdeg(u)) div scale

    Same all-bigint floor-division discipline as pagerank_scaled (every
    quantity exact on any engine/partitioning → a PPR with a value
    oracle), same ANSI overflow refusal (total mass is |S|·scale ≤
    N·scale, so pagerank_scaled's bound applies verbatim), same
    ownership-tracked reliable-checkpoint modes. Dangling nodes leak rank
    as in the base operator's default — symmetrize the edge list to avoid
    them. `seeds` is a node-id list or a 1-column DataFrame; seeds absent
    from the graph contribute nothing (both engines agree — the flag is a
    left join against the node table).

    Scale shape: identical to pagerank_scaled — per iteration one
    groupBy(dst) shuffle of partial contribution sums — PLUS the sparsity
    win PPR is known for: rank_0 is nonzero only at seeds, so early
    iterations move mass only within the seeds' expanding neighborhood
    (the contribution join's rank side starts |S| rows, not N)."""
    if n_iter <= 0 or scale <= 0 or not (0 < damping_ppm < scale):
        raise ValueError("need n_iter > 0, scale > 0, 0 < damping_ppm < scale")
    if ckpt_every < 0:
        raise ValueError("ckpt_every must be >= 0")
    _require_ansi(edges, allow_non_ansi, "personalized_pagerank")
    spark = edges.sparkSession
    store = _OwnedCheckpoints(spark.sparkContext, reliable, checkpoint_dir)
    e0 = store.ckpt(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct(),
        "edges0",
    )
    # Same loop-invariant hoist as pagerank_scaled: outdegree annotated
    # onto the edge snapshot once, seed-marked node table snapshotted once
    # — otherwise every iteration's lineage re-runs the deg groupBy, the
    # nodes distinct, and the seed mark join (guide §2.4).
    deg = e0.groupBy("u").agg(F.count(F.lit(1)).alias("outdeg"))
    e = store.ckpt(e0.join(deg, "u"), "edges")  # (u, v, outdeg)
    nodes = (
        e0.select(F.col("u").alias("node"))
        .unionByName(e0.select(F.col("v").alias("node")))
        .distinct()
    )
    if isinstance(seeds, DataFrame):
        seed_df = seeds.select(F.col(seed_col).alias("node")).distinct()
    else:
        seed_df = spark.createDataFrame(
            [(s,) for s in seeds], f"node {nodes.schema['node'].dataType.simpleString()}"
        ).distinct()
    marked = store.ckpt(
        nodes.join(
            F.broadcast(seed_df.withColumn("__s", F.lit(1))), "node", "left"
        ).select("node", F.coalesce(F.col("__s"), F.lit(0)).alias("is_seed")),
        "marked",
    )
    store.drop("edges0")
    base = scale - damping_ppm
    rank = marked.select(
        "node", "is_seed", (F.col("is_seed") * scale).cast("bigint").alias("rank")
    )
    for it in range(n_iter):
        contrib = (
            e.join(rank.filter(F.col("rank") > 0), e.u == F.col("node"))
            .select(F.col("v"), F.expr("`rank` div outdeg").alias("contrib"))
            .groupBy("v")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        rank = (
            marked.join(contrib, marked.node == contrib.v, "left")
            .select(
                "node",
                "is_seed",
                (
                    F.col("is_seed") * base
                    + F.expr(
                        f"({damping_ppm} * coalesce(in_sum, 0)) div {scale}"
                    )
                ).cast("bigint").alias("rank"),
            )
        )
        if ckpt_every and (it + 1) % ckpt_every == 0 and it + 1 < n_iter:
            rank = store.ckpt(rank, "rank")
    out = rank.select("node", "rank")
    if reliable:
        out = store.ckpt(out, "rank")
        store.drop("edges", "marked")
    return out


def triangle_counts(
    edges: DataFrame,
    src: str = "u1",
    dst: str = "u2",
    materialize: bool = True,
    reliable: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph.

    `edges` must hold one row per unordered edge (src < dst, no
    duplicates, no self-loops) — the canonical form the co-occurrence /
    near-dup pair builders already emit. Returns (node, n_tri) for every
    node in at least one triangle; total triangles = sum(n_tri) / 3.

    Algorithm — degree-ordered orientation (Schank & Wagner '05; the
    MapReduce formulation is Suri & Vassilvitskii, WWW'11): orient every
    edge from its lower endpoint to its higher endpoint under the total
    order (degree, node id). The orientation is acyclic and each triangle
    has exactly ONE node with both its triangle edges outgoing, so counting
    wedges (a→y, a→z, y < z) closed by the unordered edge {y, z} counts
    each triangle exactly once. Why this is THE scale formulation: wedge
    generation is Σ outdeg(v)² with outdeg bounded by O(√m) after
    orientation — O(m^1.5) total even on power-law graphs — whereas naive
    wedge counting is Σ deg(v)², which detonates on hub nodes (a degree-1M
    hub contributes 5e11 naive wedges but at most ~m oriented ones).

    Plan shape: two broadcast-size degree joins, one self-join on the wedge
    apex `a` (shuffle keyed by apex — the only O(wedges) stage), one
    equi-join against the canonical edge set to close wedges, one corner
    explode + groupBy(node). Determinism: counts are partition-invariant
    integers; ties in the degree order break by node id, so the oriented
    edge set is unique — both engines replay it bit-for-bit.

    `materialize=True` (default) checkpoints the ORIENTED edge table before
    the three-way fan-out (wedge left/right + closing set). Without it the
    edge-builder subtree is cloned into every branch and Spark does not
    reuse the exchanges — measured on the co-occurrence registry graph, the
    un-materialized plan held 180 FileScans / 499 Exchanges / 0 reuse and
    ran 3× slower. Same checkpoint-mode contract as connected_components:
    the default `localCheckpoint` is executor-resident (fast, no recompute
    path on executor loss); pass `reliable=True` (+ `checkpoint_dir`) at
    cluster scale. `materialize=False` keeps the operator fully lazy for
    composition into larger single-pass plans.
    """
    store = _OwnedCheckpoints(
        edges.sparkSession.sparkContext, reliable, checkpoint_dir
    )
    e = edges.select(F.col(src).alias("u1"), F.col(dst).alias("u2"))
    if materialize:
        # The caller's edge-builder subtree (for the registry row: an
        # events co-occurrence self-join) feeds the degree union TWICE
        # and the orientation join once — snapshot it so it executes
        # once, not three times, inside the orientation checkpoint job.
        # Dropped right after `o` materializes (it is superseded).
        e = store.ckpt(e, "tri-edges")
    deg = (
        e.select(F.col("u1").alias("u"))
        .unionAll(e.select(F.col("u2").alias("u")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = e.join(
        F.broadcast(deg.select(F.col("u").alias("u1"), F.col("d").alias("d1"))),
        "u1",
    ).join(
        F.broadcast(deg.select(F.col("u").alias("u2"), F.col("d").alias("d2"))),
        "u2",
    )
    lower_first = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("u1") < F.col("u2"))
    )
    o = ed.select(
        F.when(lower_first, F.col("u1")).otherwise(F.col("u2")).alias("a"),
        F.when(lower_first, F.col("u2")).otherwise(F.col("u1")).alias("b"),
    )
    if materialize:
        # The final snapshot backs the returned DataFrame, so it is never
        # dropped here; reliable-mode callers sharing a checkpoint dir get
        # ownership-tracked hygiene for free.
        o = store.ckpt(o, "oriented")
        store.drop("tri-edges")
    wedges = (
        o.select("a", F.col("b").alias("y"))
        .join(o.select("a", F.col("b").alias("z")), "a")
        .filter(F.col("y") < F.col("z"))
    )
    # Closing edges canonicalized by node id (y < z) — orientation order and
    # id order can disagree, so re-key the edge set rather than probing both
    # directions.
    closing = o.select(
        F.least("a", "b").alias("y"), F.greatest("a", "b").alias("z")
    )
    tri = wedges.join(closing, ["y", "z"])
    # One explode, not a 3-way union: the union form clones the whole
    # wedge-close join tree once per corner projection (measured: 3
    # copies, 18 edge-snapshot scans, zero exchange reuse in the
    # registry row's plan), so every triangle was found three times.
    # explode(array(a,y,z)) emits the same corner multiset from ONE
    # execution of the join (guide §2.4).
    corners = tri.select(
        F.explode(F.array(F.col("a"), F.col("y"), F.col("z"))).alias("node")
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    n_iter: int = 3,
    src: str = "u1",
    dst: str = "u2",
    reliable: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """k-core peeling over an undirected graph — the classical density
    filter (Seidman '83; in pipeline terms: keep the community kernel,
    shed the long tail of weakly-connected spam/drive-by nodes before
    expensive per-node analytics like PageRank or embeddings).

    `edges` must hold one row per unordered edge (src < dst, no
    duplicates, no self-loops) — the same canonical form the other graph
    operators consume. Runs `n_iter` FIXED peeling rounds; round t
    computes degrees over the surviving edge set, drops nodes with
    degree < k, and restricts edges to surviving endpoints. Returns
    (node, degree) for nodes alive entering round `n_iter` with
    degree ≥ k, where `degree` is measured at the START of that round —
    a deterministic PARTIAL peel that equals the true k-core once the
    peel has converged (each round strictly shrinks the node set, so
    convergence is detectable as a fixpoint; fixed rounds keep the
    result expressible as an unrolled DuckDB CTE chain, the same
    bounded-unroll contract as pagerank_scaled's oracle).

    Scale shape (100 TB): each round is ONE degree aggregation (map-side
    combined, keyed by node) plus two semi-joins restricting the edge
    table — both equi-joins AQE can broadcast as soon as the surviving
    set shrinks, which it does geometrically on real graphs. The edge
    table is re-materialized per round (default eager localCheckpoint;
    `reliable=True` + `checkpoint_dir` for the executor-loss-safe mode,
    ownership-tracked cleanup shared with connected_components), so round
    t+1 reads a concrete table instead of re-executing rounds 1..t.
    All-integer, partition-invariant, exact-oracle-able.
    """
    if k < 1 or n_iter < 1:
        raise ValueError("k and n_iter must be >= 1")
    store = _OwnedCheckpoints(edges.sparkSession.sparkContext, reliable, checkpoint_dir)
    e = edges.select(F.col(src), F.col(dst))
    deg = None
    for it in range(n_iter):
        if it > 0:
            e = store.ckpt(e, "kcore-edges")
        deg = (
            e.select(F.col(src).alias("node"))
            .unionAll(e.select(F.col(dst).alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        )
        if it < n_iter - 1:
            surv = deg.filter(F.col("degree") >= k).select("node")
            e = e.join(
                surv.select(F.col("node").alias(src)), src, "left_semi"
            ).join(surv.select(F.col("node").alias(dst)), dst, "left_semi")
    return deg.filter(F.col("degree") >= k)


def label_propagation(
    edges: DataFrame,
    n_iter: int = 3,
    src: str = "u1",
    dst: str = "u2",
    reliable: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007) over an undirected graph, made fully deterministic: every node
    starts labeled with its own id; each round a node adopts the label
    that is most frequent among its neighbors' previous-round labels,
    ties broken by SMALLEST label (the same count-desc/key-asc contract
    as the deterministic mode operator, relational.mode_per_group).
    Runs `n_iter` FIXED synchronous rounds — deterministic and
    partition-invariant by construction, so like pagerank_scaled and
    kcore_peel it carries an exact unrolled-CTE oracle (asynchronous/
    randomized LPA variants converge faster but are unorderable).

    `edges` must be canonical undirected form (src < dst, distinct, no
    self-loops). Returns (node, label) after the final round.

    Scale shape (100 TB): the symmetrized adjacency is materialized ONCE
    (eager localCheckpoint; `reliable=True` for the executor-loss-safe
    mode with ownership-tracked cleanup); each round is one equi-join of
    the label table onto adjacency (both keyed by node id — co-hashed)
    plus two map-side-combinable integer aggregations: count labels per
    (node, neighbor-label), then min-struct((-count, label)) per node —
    no window sort, no Python. Label state is re-materialized per round
    so round t+1 reads a concrete table instead of re-executing rounds
    1..t.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    store = _OwnedCheckpoints(edges.sparkSession.sparkContext, reliable, checkpoint_dir)
    e = edges.select(F.col(src), F.col(dst))
    adj = store.ckpt(
        e.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionAll(
            e.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        ),
        "lpa-adj",
    )
    labels = adj.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for t in range(n_iter):
        counts = (
            adj.join(
                labels.select(F.col("node").alias("b"), "label"), "b"
            )
            .groupBy("a", "label")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        labels = (
            counts.select(
                F.col("a").alias("node"),
                F.struct(
                    (-F.col("cnt")).alias("nc"), F.col("label").alias("l")
                ).alias("s"),
            )
            .groupBy("node")
            .agg(F.min("s").alias("s"))
            .select("node", F.col("s.l").alias("label"))
        )
        if t < n_iter - 1:
            labels = store.ckpt(labels, "lpa-labels")
    return labels


def hits_scaled(
    edges: DataFrame,
    n_iter: int = 2,
    src: str = "u",
    dst: str = "i",
    scale: int = 65_536,
    reliable: bool = False,
    checkpoint_dir: str | None = None,
    allow_non_ansi: bool = False,
) -> DataFrame:
    """Integer-scaled HITS (Kleinberg '99) over a DIRECTED edge list:
    hubs point, authorities are pointed at. Returns one row per node with
    (side, node, score) — side 'hub' for src-nodes, 'authority' for
    dst-nodes, node cast to string so bipartite graphs with differently
    typed sides still fit one frame.

    Update rule (all bigint — deterministic on any engine/partitioning,
    so a HITS carries an exact value oracle like pagerank_scaled):

        auth_raw(i) = Σ_{u→i} hub(u);   auth = auth_raw·scale div max(auth_raw)
        hub_raw(u)  = Σ_{u→i} auth(i);  hub  = hub_raw·scale div max(hub_raw)

    i.e. the classic power iteration with max-normalization instead of
    the L2 norm — same fixed point ordering, but floor division on
    integers instead of a square root on floats, which is what keeps both
    engines bit-identical. Every hub starts at exactly `scale`; after
    each half-step the max score is exactly `scale`, so scores are
    directly readable as fractions of the top hub/authority.

    Overflow: raw ≤ max_in_degree·scale and the rescale computes
    raw·scale, so the bound is max_degree·scale² < 2^63 — degree up to
    ~2·10⁹ at the default scale 2^16 (drop scale for denser graphs).
    Non-ANSI sessions would wrap silently past that, so like
    pagerank_scaled this refuses to build unless ANSI is on
    (`allow_non_ansi=True` to override).

    Scale shape (100 TB): per half-step one equi-join of the score table
    onto the edge list (both keyed by node id) + one map-side-combinable
    bigint sum + a 1-row max broadcast for the rescale; score state is
    re-materialized per half-step (eager localCheckpoint; `reliable=True`
    + ownership-tracked cleanup for the executor-loss-safe mode) so later
    steps read concrete tables. Nothing wider than (node, score) ever
    shuffles.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    _require_ansi(edges, allow_non_ansi, "hits_scaled")
    store = _OwnedCheckpoints(edges.sparkSession.sparkContext, reliable, checkpoint_dir)
    e = store.ckpt(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("i")).distinct(),
        "hits-edges",
    )

    def _rescale(raw: DataFrame, node: str) -> DataFrame:
        mx = raw.agg(F.max("s").alias("mx"))
        return raw.join(F.broadcast(mx)).select(
            node, F.expr(f"(s * CAST({scale} AS BIGINT)) div mx").alias("s")
        )

    hub = e.select("u").distinct().withColumn("s", F.lit(scale).cast("bigint"))
    auth = None
    for t in range(n_iter):
        auth = store.ckpt(
            _rescale(
                e.join(hub, "u")
                .groupBy("i")
                .agg(F.sum("s").cast("bigint").alias("s")),
                "i",
            ),
            "hits-auth",
        )
        hub = _rescale(
            e.join(auth, "i").groupBy("u").agg(F.sum("s").cast("bigint").alias("s")),
            "u",
        )
        if t < n_iter - 1:
            hub = store.ckpt(hub, "hits-hub")
    return auth.select(
        F.lit("authority").alias("side"),
        F.col("i").cast("string").alias("node"),
        F.col("s").alias("score"),
    ).unionAll(
        hub.select(
            F.lit("hub").alias("side"),
            F.col("u").cast("string").alias("node"),
            F.col("s").alias("score"),
        )
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    n_rounds: int = 3,
    src: str = "u1",
    dst: str = "u2",
    seed_col: str = "node",
    reliable: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Multi-source BFS hop distance over an undirected graph: every
    node within `n_rounds` hops of ANY seed, with its exact minimum hop
    count — the reachability/influence-radius primitive (how far is each
    user from a converter? which docs sit within 2 links of a flagged
    source?) that completes the iterative-graph family alongside
    connected_components / pagerank_scaled / kcore_peel /
    label_propagation.

    `edges` must be canonical undirected form (src < dst, distinct, no
    self-loops). `seeds` is a 1-column frame of start nodes; seeds not
    present in the graph are dropped (the result is graph-scoped).
    Returns (node, dist) with dist in [0, n_rounds] — bounded-depth BFS,
    the same fixed-round bounded-unroll contract that gives the other
    iterative operators exact DuckDB CTE oracles.

    Scale shape (100 TB): the symmetrized adjacency is materialized ONCE
    (eager localCheckpoint; `reliable=True` for the executor-loss-safe
    mode with ownership-tracked cleanup); round t expands only the
    FRONTIER — nodes first settled at distance exactly t — through one
    equi-join on the adjacency (co-hashed on node id) and folds the
    candidates back with one map-side-combinable min aggregation. A node
    first reached at t+1 is always reached from a dist-t node, so
    frontier expansion equals full relaxation while joining a
    geometrically smaller table each round. All-integer,
    partition-invariant, no window sort.
    """
    if n_rounds < 1:
        raise ValueError("n_rounds must be >= 1")
    store = _OwnedCheckpoints(edges.sparkSession.sparkContext, reliable, checkpoint_dir)
    e = edges.select(F.col(src), F.col(dst))
    adj = store.ckpt(
        e.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionAll(
            e.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        ),
        "bfs-adj",
    )
    nodes = adj.select(F.col("a").alias("node")).distinct()
    dist = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .join(nodes, "node", "left_semi")
        .withColumn("dist", F.lit(0).cast("bigint"))
    )
    for t in range(n_rounds):
        frontier = dist.filter(F.col("dist") == t).select(F.col("node").alias("b"))
        cand = adj.join(frontier, "b").select(
            F.col("a").alias("node"), F.lit(t + 1).cast("bigint").alias("dist")
        )
        dist = (
            dist.unionAll(cand)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
        )
        if t < n_rounds - 1:
            dist = store.ckpt(dist, "bfs-dist")
    return dist


def sssp_weighted(
    edges: DataFrame,
    seeds: DataFrame,
    n_rounds: int = 4,
    src: str = "u",
    dst: str = "v",
    weight_col: str = "w",
    seed_col: str = "node",
    reliable: bool = False,
    checkpoint_dir: str | None = None,
    allow_non_ansi: bool = False,
) -> DataFrame:
    """Bounded-round single/multi-source shortest paths over non-negative
    INTEGER edge weights (Bellman-Ford with frontier propagation) — the
    weighted companion to bfs_hops' hop counts, ninth member of the
    iterative graph family: (node, dist) for every node whose shortest
    weighted distance from any seed is witnessed by a path of at most
    `n_rounds` edges. The fixed-round bounded-unroll contract is what
    gives it an exact DuckDB CTE oracle, like the rest of the family.

    Frontier propagation is exact, not heuristic: round t relaxes only
    from nodes whose distance IMPROVED in round t−1, which yields the
    same d_t sequence as full relaxation (an unchanged node's
    contribution was already folded the round after it last changed) —
    the oracle replays FULL relaxation and must agree bit-for-bit.

    `edges` is directed (u → v, weight w ≥ 0 bigint); symmetrize for
    undirected graphs. All-integer min-merge per round (one equi-join on
    the adjacency + one map-side-combinable min), distance tables
    re-materialized per round so round t never replays rounds 1..t−1;
    `reliable=True` stages through the ownership-tracked checkpoint
    store. Overflow: dist ≤ n_rounds·max_w, nowhere near bigint."""
    if n_rounds < 1:
        raise ValueError("n_rounds must be >= 1")
    _require_ansi(edges, allow_non_ansi, "sssp_weighted")
    store = _OwnedCheckpoints(edges.sparkSession.sparkContext, reliable, checkpoint_dir)
    adj = store.ckpt(
        edges.select(
            F.col(src).alias("a"), F.col(dst).alias("b"),
            F.col(weight_col).cast("bigint").alias("w"),
        ).distinct(),
        "sssp-adj",
    )
    # Seeds enter at dist 0 UNCONDITIONALLY — a seed absent from the edge
    # set is still at distance 0 from itself (its row survives with no
    # outgoing relaxation), matching the oracle's d0 CTE, which emits the
    # seed before intersecting with the graph.
    dist = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("bigint"))
    )
    dist = store.ckpt(dist, "dist", keep=2)
    frontier = dist
    for _t in range(n_rounds):
        cand = (
            adj.join(frontier.withColumnRenamed("node", "a"), "a")
            .select(
                F.col("b").alias("node"),
                (F.col("dist") + F.col("w")).cast("bigint").alias("dist"),
            )
        )
        merged = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
        )
        merged = store.ckpt(merged, "dist", keep=2)
        old = dist.withColumnRenamed("dist", "__old")
        frontier = (
            merged.join(old, "node", "left")
            .filter(F.col("__old").isNull() | (F.col("dist") < F.col("__old")))
            .select("node", "dist")
        )
        dist = merged
    if reliable:
        store.drop("sssp-adj")
    return dist
