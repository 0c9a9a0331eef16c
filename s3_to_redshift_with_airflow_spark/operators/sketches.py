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
    return (
        spark.range(n_words)
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
