"""Persistable HLL sketch tables (Spark 4 native DataSketches).

The 100 TB rollup pattern: build per-(grain) sketches ONCE from the raw
data, persist them as an ordinary parquet table (the sketch is a ~KB
binary column regardless of cardinality), and serve every coarser-grain
distinct-count rollup by MERGING stored sketches — the raw data is never
re-scanned, and may even be deleted/archived. DataSketches HLL union is
associative and the estimate is a pure function of the hashed value set,
so rollups built from the stored table are bit-identical to rollups built
directly from the raw rows (pinned in tests/test_scale_ops.py, including
a delete-the-raw-data test).

Split into two composable plans so the persistence seam is real:
`daily_user_sketches` produces the storable table; `rollup_user_sketches`
consumes EITHER that live DataFrame or a parquet read of it.

Reference parity: the reference has no sketch surface — BASELINE.json
extension (approximate distinct rollups), same family as
plans/scale_ops.q_sketch_rollup which composes these two stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_user_sketches(
    events: DataFrame,
    value_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per (event_type, day) HLL sketch of distinct `value_col` —
    (event_type, day, sk: binary). One pass, one groupBy shuffle of
    partial sketches (hll_sketch_agg merges map-side); the output is
    ~KB·(types×days) however large the input. Write it to parquet and
    every future rollup reads THIS table instead of the raw events."""
    return events.groupBy(
        F.col(type_col).alias("event_type"), F.to_date(ts_col).alias("day")
    ).agg(F.expr(f"hll_sketch_agg({value_col})").alias("sk"))


def rollup_user_sketches(daily: DataFrame) -> DataFrame:
    """Merge per-day sketches to the event_type grain —
    (event_type, n_days, est_users). `daily` may be the live
    daily_user_sketches plan or `spark.read.parquet(<sketch table>)`:
    hll_union_agg is associative, so the result is identical either way
    and the raw data is never touched."""
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.expr("hll_sketch_estimate(hll_union_agg(sk))")
            .cast("bigint")
            .alias("est_users"),
        )
        .orderBy("event_type")
    )


def _bloom_pos(key: F.Column, j: int, n_bits: int) -> F.Column:
    """Bloom bit position j for a key — the engine-portable md5-int60 hash
    (DuckDB twin: ('0x' || substr(md5('bf:j:' || key), 1, 15))::UBIGINT)."""
    from .classify import _md5_int60

    return _md5_int60(F.concat(F.lit(f"bf:{j}:"), key.cast("string"))) % n_bits


def bloom_bitmap(keys: DataFrame, key_col: str, n_bits: int, k_hashes: int) -> DataFrame:
    """Pack a key set into an n_bits Bloom filter as ONE row holding an
    array of n_bits/32 non-negative bigints (32-bit words, so shifts never
    touch the sign bit). Build cost: one groupBy(word) over a k-exploded
    key scan — at most n_bits/32 groups, map-side combined — then a dense
    densify against a range frame and a single collect_list row.

    n_bits must be a positive multiple of 32: the packed word array has
    exactly n_bits/32 entries, so a ragged last word would silently drop
    bit positions >= 32*(n_bits//32) from the build side while probes
    still index past the array end — ANSI error at best, silent false
    negatives at worst (ADVICE r5)."""
    if n_bits <= 0 or n_bits % 32 != 0:
        raise ValueError(f"n_bits must be a positive multiple of 32, got {n_bits}")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    n_words = n_bits // 32
    spark = keys.sparkSession
    pos = keys.select(
        F.explode(
            F.array(*[_bloom_pos(F.col(key_col), j, n_bits) for j in range(k_hashes)])
        ).alias("pos")
    )
    bits = (
        pos.select(
            F.expr("pos div 32").alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), (F.col("pos") % 32).cast("int")
            ).alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("b"))
    )
    # densify-range partitions sized to the WORD COUNT (≥1M words per
    # partition), not spark.range's default parallelism: a KB-sized
    # segment bitmap otherwise fans its densify across one task per core
    # (32 tasks joining a handful of set words — pure scheduling tax on
    # every per-epoch bloom publish; guide §2.6)
    return (
        spark.range(0, n_words, 1, max(1, n_words // (1 << 20)))
        .select(F.col("id").alias("word"))
        .join(bits, "word", "left")
        .select("word", F.coalesce("b", F.lit(0).cast("bigint")).alias("b"))
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("word", "b"))),
                lambda s: s["b"],
            ).alias("arr")
        )
    )


def bloom_member(key: F.Column, n_bits, k_hashes: int) -> F.Column:
    """Membership test against a packed `bloom_bitmap` row: true iff all
    k bit positions for `key` are set in the `arr` column (which must be
    in scope — broadcast-joined alongside the probe rows). Zero false
    negatives by construction: a key that was fed to `bloom_bitmap` under
    the same (n_bits, k_hashes) ALWAYS passes, so a non-member verdict is
    proof of absence — the property the segmented index maintainers'
    O(delta) disjointness probe rests on (streaming/pipeline.py).

    `n_bits` may be an int (one filter) or a Column — pass
    `F.size("arr") * 32` when probing rows of DIFFERENTLY-SIZED bitmaps
    (the segment stores size each bitmap to its segment's cardinality)."""

    def _bit_ok(j: int) -> F.Column:
        p = _bloom_pos(key, j, n_bits)
        word = F.element_at(F.col("arr"), (p.cast("int") / 32).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (p % 32).cast("int")
        )
        return word.bitwiseAND(mask) != 0

    ok = _bit_ok(0)
    for j in range(1, k_hashes):
        ok = ok & _bit_ok(j)
    return ok


def bloom_bitmap_grouped(
    keys: DataFrame,
    key_col: str,
    group_col: str,
    bits_per_key: int,
    min_bits: int,
    max_bits: int,
    k_hashes: int,
) -> DataFrame:
    """One packed Bloom bitmap PER GROUP in a single distributed plan —
    the sharded store-wide summary's build (VERDICT r10 next #3): each
    group's filter is sized to its OWN cardinality (32-aligned, clamped
    to [min_bits, max_bits]), so a skewed shard loses capacity headroom
    gracefully instead of poisoning every other shard's precision.
    Returns (group_col, n_ids, arr); probe rows against their group's
    bitmap with `bloom_member(key, F.size("arr") * 32, k_hashes)` —
    same hash family as `bloom_bitmap`, so single and grouped filters
    are probe-compatible.

    Plan: two hash aggregates — (group, word) bit_or, then the dense
    densify as an exploded per-group word range LEFT-JOINED to the set
    words and one array_sort(collect_list) per group (the single-build
    idiom, O(words log words)) — no per-group driver jobs, no window.
    A first cut densified with transform(sequence, element_at(map)) —
    but element_at on a Spark map is a LINEAR SCAN, making the fill
    quadratic in shard size (~10^12 ops at a 2M-word shard; the r11
    probe sat on it for an hour). The per-group n_bits rides a
    broadcast of the |groups|-row count table."""
    if min_bits <= 0 or min_bits % 32 or max_bits % 32 or min_bits > max_bits:
        raise ValueError(f"bad bit bounds [{min_bits}, {max_bits}]")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    sized = (
        keys.groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
        .withColumn(
            "__bits",
            F.least(
                F.lit(max_bits).cast("bigint"),
                F.greatest(
                    F.lit(min_bits).cast("bigint"),
                    (
                        F.floor(
                            (F.lit(bits_per_key) * F.col("__n") + F.lit(31))
                            / F.lit(32)
                        )
                        * 32
                    ).cast("bigint"),
                ),
            ),
        )
    )
    pos = keys.join(F.broadcast(sized), group_col).select(
        group_col,
        "__bits",
        F.explode(
            F.array(
                *[
                    _bloom_pos(F.col(key_col), j, F.col("__bits"))
                    for j in range(k_hashes)
                ]
            )
        ).alias("pos"),
    )
    bits = (
        pos.select(
            group_col,
            "__bits",
            F.expr("pos div 32").alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), (F.col("pos") % 32).cast("int")
            ).alias("m"),
        )
        .groupBy(group_col, "__bits", "word")
        .agg(F.bit_or("m").alias("b"))
    )
    dense = sized.select(
        group_col,
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                (F.expr("__bits div 32") - F.lit(1)).cast("bigint"),
            )
        ).alias("word"),
    )
    return (
        dense.join(bits.drop("__bits"), [group_col, "word"], "left")
        .select(
            group_col,
            "word",
            F.coalesce("b", F.lit(0).cast("bigint")).alias("b"),
        )
        .groupBy(group_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("word", "b"))),
                lambda s: s["b"],
            ).alias("arr")
        )
        .join(F.broadcast(sized.select(group_col, "__n")), group_col)
        .select(group_col, F.col("__n").alias("n_ids"), "arr")
    )


def bloom_semijoin_stats(
    probe: DataFrame,
    probe_key: str,
    keys: DataFrame,
    key_col: str = "k",
    n_bits: int = 16384,
    k_hashes: int = 3,
) -> DataFrame:
    """Bloom-prefiltered semi-join AUDIT: broadcast the packed bitmap as
    one row, evaluate membership map-side per probe row, and verify
    against the exact key set — returns the single stats row
    (n_probe, n_keys, bloom_pass, exact_hits, false_pos, missed,
    fp_rate_bp). missed == 0 always (no false negatives); in production
    the exact-verify join receives only the bloom_pass rows, which is the
    point of the pattern at 100 TB. All arithmetic is deterministic
    integers, so the whole audit carries an exact SQL oracle."""
    bm = bloom_bitmap(keys, key_col, n_bits, k_hashes)
    n_keys = keys.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))

    def _bit_ok(j: int) -> F.Column:
        p = _bloom_pos(F.col(probe_key), j, n_bits)
        word = F.element_at(F.col("arr"), (p.cast("int") / 32).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (p % 32).cast("int")
        )
        return word.bitwiseAND(mask) != 0

    bloom_ok = _bit_ok(0)
    for j in range(1, k_hashes):
        bloom_ok = bloom_ok & _bit_ok(j)
    flagged = (
        probe.select(probe_key)
        .crossJoin(F.broadcast(bm))
        .join(
            F.broadcast(keys.withColumn("hit", F.lit(1))),
            F.col(probe_key) == F.col(key_col),
            "left",
        )
        .select(
            bloom_ok.alias("bloom_ok"), F.col("hit").isNotNull().alias("is_hit")
        )
    )
    stats = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probe"),
        F.sum(F.when(F.col("bloom_ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("bloom_pass"),
        F.sum(F.when(F.col("is_hit"), 1).otherwise(0))
        .cast("bigint")
        .alias("exact_hits"),
        F.sum(F.when(F.col("bloom_ok") & ~F.col("is_hit"), 1).otherwise(0))
        .cast("bigint")
        .alias("false_pos"),
        F.sum(F.when(F.col("is_hit") & ~F.col("bloom_ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("missed"),
    )
    return stats.crossJoin(F.broadcast(n_keys)).select(
        "n_probe",
        "n_keys",
        "bloom_pass",
        "exact_hits",
        "false_pos",
        "missed",
        # guard: every probe a true member => no negatives to misfire on
        # (ANSI div-by-zero otherwise — found by the hypothesis test)
        F.expr(
            "case when n_probe = exact_hits then cast(0 as bigint)"
            " else false_pos * 10000 div (n_probe - exact_hits) end"
        ).alias("fp_rate_bp"),
    )


def bloom_semijoin(
    probe: DataFrame,
    probe_key: str,
    keys: DataFrame,
    key_col: str = "k",
    n_bits: int = 16384,
    k_hashes: int = 3,
) -> DataFrame:
    """The PRODUCTION shape of the Bloom prefilter: return the probe rows
    that are true members, with the bitmap test running map-side BEFORE
    the verify join so only bloom_pass rows (the members plus the bounded
    false-positive tail) ever reach the join. Row-for-row identical to a
    plain left-semi join — Bloom filters have no false negatives and the
    verify join removes the false positives — which the unit test pins;
    at 100 TB the difference is that the join input shrank by the filter's
    rejection rate without shuffling the probe side."""
    bm = bloom_bitmap(keys, key_col, n_bits, k_hashes)

    def _bit_ok(j: int) -> F.Column:
        p = _bloom_pos(F.col(probe_key), j, n_bits)
        word = F.element_at(F.col("arr"), (p.cast("int") / 32).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (p % 32).cast("int")
        )
        return word.bitwiseAND(mask) != 0

    ok = _bit_ok(0)
    for j in range(1, k_hashes):
        ok = ok & _bit_ok(j)
    prefiltered = (
        probe.crossJoin(F.broadcast(bm)).filter(ok).drop("arr")
    )
    return prefiltered.join(
        F.broadcast(keys.select(F.col(key_col))),
        prefiltered[probe_key] == F.col(key_col),
        "left_semi",
    )


def value_histogram(
    df: DataFrame,
    value_col: str = "value",
    grain_cols: list[str] | None = None,
    ts_col: str = "ts",
    width: float = 8.0,
) -> DataFrame:
    """Per (grain..., day, bucket) value histogram — the QUANTILE sketch of
    the persistable-sketch family (HLL = distinct counts, CMS = point
    frequencies, Bloom = membership, THIS = distributions): build per-day
    bucket counts ONCE, persist them as an ordinary parquet table
    (≤ range/width rows per grain-day however large the input), and serve
    every later quantile/rollup by SUMMING stored buckets — the raw rows
    are never re-scanned and may be deleted.

    Unlike HLL/t-digest blobs, the sketch CONTENT is exact integers over a
    deterministic bucketing (bucket = floor(value/width); keep `width` a
    power of two so the division is exact in binary floating point), so
    both the stored table and everything derived from it carry exact
    DuckDB value oracles — merge-of-days == direct-build is an equality,
    not an estimate. NULL values are excluded (count them in
    validation_report). Accuracy contract: a quantile read from the
    histogram is the upper boundary of the bucket containing the
    ⌈q·n/100⌉-th order statistic — that statistic lies within one bucket
    width below the estimate (pinned in tests; note interpolated
    `percentile` anchors one order stat earlier and can sit in the
    previous bucket, so the bound is stated against the discrete
    statistic)."""
    gcols = grain_cols or []
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            *gcols,
            F.to_date(ts_col).alias("day"),
            F.floor(F.col(value_col) / F.lit(width)).cast("bigint").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def histogram_quantiles(
    hist: DataFrame,
    grain_cols: list[str] | None = None,
    q_pcts: list[int] | None = None,
    width: float = 8.0,
) -> DataFrame:
    """Quantiles served from a (possibly parquet-read, possibly multi-day)
    histogram table: merge buckets across days, one cumulative window per
    grain over bucket order, and for each requested percentile return the
    smallest bucket whose cumulative count covers it — estimate = the
    bucket's UPPER boundary (bucket+1)·width, so the true quantile is
    within one width below the estimate, never above.

    The quantile pick is the exact integer predicate cum·100 ≥ q·total (no
    float percentile math anywhere), so the output is engine-exact. Output:
    (grain..., q_pct, n_total, est_value), ordered deterministic.

    Scale shape: the window runs over BUCKET granularity (≤ range/width
    rows per grain — constant in corpus size), never rows; merging days is
    one map-side-combinable sum. This is the aggregate-then-window
    discipline with the aggregate persisted."""
    gcols = grain_cols or []
    qs = q_pcts or [50, 95, 99]
    if not all(0 < q <= 100 for q in qs):
        raise ValueError("q_pcts must be integer percents in (0, 100]")
    from pyspark.sql import Window

    merged = hist.groupBy(*gcols, "bucket").agg(F.sum("n").cast("bigint").alias("n"))
    w = Window.partitionBy(*gcols).orderBy(F.col("bucket").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy(*gcols)
    cum = merged.select(
        *gcols,
        "bucket",
        F.sum("n").over(w).cast("bigint").alias("cum"),
        F.sum("n").over(wt).cast("bigint").alias("n_total"),
    )
    # ALL requested quantiles in ONE aggregation pass (a per-q filter+agg
    # union would re-execute the window subtree per quantile), then an
    # unpivot to the (grain, q_pct) row shape.
    picked = cum.groupBy(*gcols).agg(
        F.min("n_total").alias("n_total"),  # constant per grain
        *[
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.lit(q) * F.col("n_total"),
                    F.col("bucket"),
                )
            ).alias(f"__b{q}")
            for q in qs
        ],
    )
    stack = ", ".join(f"cast({q} as bigint), __b{q}" for q in qs)
    return picked.select(
        *gcols,
        "n_total",
        F.expr(f"stack({len(qs)}, {stack}) as (q_pct, __b)"),
    ).select(
        *gcols,
        "q_pct",
        "n_total",
        ((F.col("__b") + 1).cast("double") * F.lit(width)).alias("est_value"),
    )


# --- KMV (k-minimum-values) theta sketch -------------------------------------
#
# The fourth sketch family next to HLL (sketch_rollup), CMS
# (cms_point_queries), Bloom (bloom_semijoin) and the value histogram
# (value_histogram_daily / histogram_quantiles). KMV is the one that buys
# SET OPERATIONS: keeping the k smallest hash values of a key set yields a
# distinct-count estimator ((k-1)·D / h_k, Bar-Yossef et al. 2002 /
# DataSketches "theta"), and because a KMV sketch is literally a uniform
# sample of the hashed key space, union/intersection/Jaccard between two
# sketches are estimable by set algebra on the stored hashes — which HLL
# fundamentally cannot do (its registers only union).
#
# Engine portability: hashes are the md5-int trick at 40 bits
# (DuckDB twin: ('0x' || substr(md5('kmv:' || key), 1, 10))::UBIGINT), so
# every stored hash, every estimate, and every set-op is exact bigint
# arithmetic both engines replay bit-for-bit. 40 bits keeps
# (k-1)·2^40 ≈ 2.8e14 safely inside bigint; collisions among ~1e6 distinct
# keys are ~1e-3 expected and IDENTICAL on both engines (the oracle hashes
# the same), so exactness is unaffected. For billions of distinct keys a
# production deployment widens to the 60-bit hash + decimal128 math —
# same plan shape.


def kmv_hash40(col: F.Column, salt: str = "kmv") -> F.Column:
    """First 10 md5 hex nibbles of 'salt:key' as a non-negative 40-bit
    bigint (engine-portable; see module comment)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string"))), 1, 10),
        16,
        10,
    ).cast("bigint")


def kmv_sketch_table(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV sketch — (g, hs: array<bigint> ascending, n_kept).
    One distinct shuffle on (group, hash) then a per-group bottom-k via
    row_number (the sort is per-group over DISTINCT hashes only; at 100 TB
    you'd pre-filter with an adaptive hash threshold from a prior estimate
    so the sort sees ~k rows per group). The output is ≤ k bigints per
    group however large the input — write it to parquet and every later
    set-op reads THIS table; the raw data may be archived (pinned by a
    delete-the-raw-data test like the HLL family's).

    NULL keys and NULL groups are dropped here, at the operator: a NULL
    key hashes to NULL, which Spark's ASC window sorts FIRST but DuckDB
    sorts LAST — filtering at the source keeps every downstream consumer
    (batch set-ops, the streaming foreachBatch maintainer) engine-exact
    whatever the input's null profile."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window

    hashed = (
        df.filter(F.col(key_col).isNotNull() & F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("g"), kmv_hash40(F.col(key_col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("g").orderBy(F.col("h").asc())
    kept = hashed.select("g", "h", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= k
    )
    return kept.groupBy("g").agg(
        F.sort_array(F.collect_list("h")).alias("hs"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
    )


def kmv_pair_ops(sketches: DataFrame, k: int = 256) -> DataFrame:
    """All-pairs set operations between stored KMV sketches —
    (type_a, type_b, kp, union_est, intersect_est, jaccard_ppm), ordered.

    `sketches` is kmv_sketch_table's output (live or parquet-read). For
    each group pair (a < b): merge the two hash sets, keep the k smallest
    (kp = how many exist), and count how many of those kp live in BOTH
    input sketches (n_both). Then, all in exact bigint arithmetic:

        union_est     = kp < k ? kp : (k-1)·2^40 div h_kp   (KMV estimator)
        jaccard_ppm   = n_both·10^6 div kp                  (Beyer et al. 2007)
        intersect_est = kp < k ? n_both : n_both·union_est div kp

    When kp < k the merged sketch IS the full hash set, so union/intersect
    are exact. Plan: the sketch rows re-explode to (g, h) rows (≤ k·G), the
    G-row group list crosses to G·(G-1)/2 pairs (bounded group-granularity
    frame, never the corpus — the corpus_divergence sanction), each pair's
    hashes arrive by two equi broadcast joins, and a bucket-bounded window
    picks the merged bottom-k. Nothing here ever rescans the raw data."""
    rows = sketches.select("g", F.explode("hs").alias("h"))
    gs = sketches.select("g")
    pairs = gs.alias("a").join(
        gs.alias("b"), F.col("a.g") < F.col("b.g")
    ).select(F.col("a.g").alias("ga"), F.col("b.g").alias("gb"))
    ua = pairs.join(
        F.broadcast(rows.withColumnRenamed("g", "ga")), "ga"
    ).select("ga", "gb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    ub = pairs.join(
        F.broadcast(rows.withColumnRenamed("g", "gb")), "gb"
    ).select("ga", "gb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        ua.unionByName(ub)
        .groupBy("ga", "gb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("ga", "gb").orderBy(F.col("h").asc())
    bottomk = merged.select(
        "ga", "gb", "h", "in_a", "in_b", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= k)
    kk = bottomk.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).cast("bigint").alias("kp"),
        F.max("h").alias("hk"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_both"),
    )
    dom = 1 << 40
    return kk.select(
        F.col("ga").alias("type_a"),
        F.col("gb").alias("type_b"),
        "kp",
        F.expr(f"if(kp < {k}, kp, ({k} - 1) * cast({dom} as bigint) div hk)")
        .cast("bigint")
        .alias("union_est"),
        F.expr(
            f"if(kp < {k}, n_both,"
            f" n_both * (({k} - 1) * cast({dom} as bigint) div hk) div kp)"
        )
        .cast("bigint")
        .alias("intersect_est"),
        F.expr("n_both * 1000000 div kp").cast("bigint").alias("jaccard_ppm"),
    ).orderBy("type_a", "type_b")


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Merge two KMV sketch tables (kmv_sketch_table's schema) — the
    mergeability contract that makes the sketch INCREMENTALLY
    maintainable: because the k smallest of (bottom-k(A) ∪ bottom-k(B))
    equals the bottom-k of A ∪ B, a per-day sketch table can be folded
    into the running sketch without ever rescanning history, and the
    result is BIT-IDENTICAL to a from-scratch build over the union
    (pinned by tests, including fold-order associativity). Groups present
    on only one side pass through. Cost: the inputs re-explode to ≤ k·G
    rows each — group-count-bounded, never data-bounded."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window

    rows = (
        a.select("g", F.explode("hs").alias("h"))
        .unionByName(b.select("g", F.explode("hs").alias("h")))
        .distinct()
    )
    w = Window.partitionBy("g").orderBy(F.col("h").asc())
    kept = rows.select("g", "h", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= k
    )
    return kept.groupBy("g").agg(
        F.sort_array(F.collect_list("h")).alias("hs"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
    )


# --- persisted count-min sketch ------------------------------------------------


def cms_sketch_table(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    grain_cols: list[str] | None = None,
) -> DataFrame:
    """Count-min sketch as a persistable table — (grain..., d, bucket,
    cnt), one row per non-empty cell (≤ grain·d·w rows however large the
    input). Unlike HLL's opaque binary, the CMS CONTENT is plain bigint
    counts under the portable md5 hash, so merging is literal addition
    and every estimate served from the stored table is oracle-exact. One
    groupBy over a d-exploded scan, map-side combined."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 and w >= 2, got d={d}, w={w}")
    from .classify import _md5_int60

    gcols = grain_cols or []
    hashes = F.array(
        *[
            F.struct(
                F.lit(dd).alias("d"),
                (
                    _md5_int60(
                        F.concat(F.lit(f"cms:{dd}:"), F.col(key_col).cast("string"))
                    )
                    % w
                ).alias("bucket"),
            )
            for dd in range(d)
        ]
    )
    return (
        df.select(*gcols, F.explode(hashes).alias("h"))
        .select(*gcols, "h.d", "h.bucket")
        .groupBy(*gcols, "d", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_merge(sketches: DataFrame, grain_cols: list[str] | None = None) -> DataFrame:
    """Merge stored CMS tables by dropping grain columns and ADDING cell
    counts — count-min merge IS addition, so the merged sketch is
    bit-identical to a direct build over the union of the inputs (an
    EQUALITY, pinned in tests — not an estimate-level approximation like
    HLL's register max). `sketches` is cms_sketch_table output (live,
    parquet-read, or a unionByName of several); `grain_cols` are the
    columns to roll away (e.g. ['day']). One ≤ d·w-group aggregate."""
    keep = [c for c in sketches.columns if c not in {"cnt", *(grain_cols or [])}]
    return sketches.groupBy(*keep).agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def cms_point_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Serve point-frequency estimates from a stored CMS: hash each probe
    key through the same d rows, min over rows of the bucket count —
    est >= true frequency always. Probes broadcast against the ≤ d·w-row
    sketch; raw data never touched.

    The stored sketch holds only NON-EMPTY cells, so the lookup is a
    LEFT join with coalesce(cnt, 0): a probe key absent from the data
    (all d cells empty) returns cms_est = 0 — the true CMS answer — and
    a key with SOME empty cells mins in the 0, instead of inflating the
    estimate with the min over non-empty cells only. Every probe yields
    exactly one row."""
    from .classify import _md5_int60

    hashes = F.array(
        *[
            F.struct(
                F.lit(dd).alias("d"),
                (
                    _md5_int60(
                        F.concat(F.lit(f"cms:{dd}:"), F.col(key_col).cast("string"))
                    )
                    % w
                ).alias("bucket"),
            )
            for dd in range(d)
        ]
    )
    pk = probes.select(key_col, F.explode(hashes).alias("h")).select(
        key_col, "h.d", "h.bucket"
    )
    return (
        pk.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cms_est")
        )
    )


# --- Misra-Gries mergeable frequent-items summary -----------------------------


def mg_summary(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    grain_cols: list[str] | None = None,
) -> DataFrame:
    """Misra-Gries frequent-items summary per grain — (grain..., key,
    counter), ≤ k rows per grain whatever the input: count per key, find
    the (k+1)-th largest count t (count desc, key asc; 0 when ≤ k keys),
    keep keys with count > t at counter = count − t. This is the
    canonical offset form (a pure function of the multiset, so
    order-independent and engine-exact — the classic streaming MG is
    arrival-order dependent and could not carry an oracle) with the same
    guarantee: counter ≤ true count ≤ counter + t, t ≤ n/(k+1), and
    every key with frequency > n/(k+1) survives. One groupBy(key)
    shuffle + a window over the ≤-distinct-keys count frame."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    gcols = grain_cols or []
    cnt = df.groupBy(*gcols, F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.partitionBy(*gcols).orderBy(
        F.col("cnt").desc(), F.col("key").asc()
    )
    ranked = cnt.select(
        *gcols, "key", "cnt", F.row_number().over(w).alias("rn")
    )
    wt = Window.partitionBy(*gcols)
    t = ranked.select(
        *gcols,
        "key",
        "cnt",
        F.coalesce(
            F.max(F.when(F.col("rn") == k + 1, F.col("cnt"))).over(wt),
            F.lit(0),
        ).alias("t"),
    )
    return t.filter(F.col("cnt") > F.col("t")).select(
        *gcols, "key", (F.col("cnt") - F.col("t")).cast("bigint").alias("counter")
    )


def mg_merge(
    summaries: DataFrame, k: int = 20, grain_cols: list[str] | None = None
) -> DataFrame:
    """K-way merge of stored MG summaries (Agarwal et al., "Mergeable
    Summaries"): drop the grain columns, ADD counters per key, then
    re-truncate with the same (k+1)-th-largest offset rule. The result is
    a valid MG summary of the union whose total undercount is the sum of
    the per-part offsets plus the merge offset — still O(n/(k+1)) — and,
    because the truncation rule is a pure function of the summed
    counters, the merge is deterministic for ANY merge shape (a single
    k-way fold here; pinned in tests against pairwise folds)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    keep = [
        c for c in summaries.columns if c not in {"counter", *(grain_cols or [])}
    ]
    gcols = [c for c in keep if c != "key"]
    summed = summaries.groupBy(*keep).agg(
        F.sum("counter").cast("bigint").alias("cnt")
    )
    w = Window.partitionBy(*gcols).orderBy(
        F.col("cnt").desc(), F.col("key").asc()
    )
    ranked = summed.select(
        *keep, "cnt", F.row_number().over(w).alias("rn")
    )
    wt = Window.partitionBy(*gcols) if gcols else Window.partitionBy(F.lit(1))
    t = ranked.select(
        *keep,
        "cnt",
        F.coalesce(
            F.max(F.when(F.col("rn") == k + 1, F.col("cnt"))).over(wt),
            F.lit(0),
        ).alias("t"),
    )
    return t.filter(F.col("cnt") > F.col("t")).select(
        *keep, (F.col("cnt") - F.col("t")).cast("bigint").alias("counter")
    )
