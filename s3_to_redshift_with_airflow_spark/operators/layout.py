"""Z-order data layout: multi-column locality keys for file skipping.

At 100 TB the scan is the cost, and the scan is cheap only when file-level
min/max statistics prune most files. Sorting by ONE column gives perfect
pruning on that column and none on the others; interleaving the bits of k
normalized columns (the Z-order / Morton curve — the technique behind
Delta/Iceberg OPTIMIZE ZORDER BY) gives useful pruning on EVERY indexed
column at once, because curve-adjacent rows are close in all k dimensions,
so each file's bounding box is small in all k dimensions.

Everything here is exact integer arithmetic on non-negative bigints
(min-max normalize with floor division, then fixed shifts/masks), so the
key is bit-identical on any engine or partitioning and the registry entry
carries an exact DuckDB value oracle — same determinism discipline as
kmeans_int8/pagerank_scaled.

Scale shape: one 1-row min/max aggregate (broadcast back), then the key is
a pure codegen expression per row; the layout itself is a repartitionByRange
+ sortWithinPartitions on the key — exactly one range shuffle, the same
cost as any global sort, after which every written file covers a compact
Z-curve segment.

Reference parity: the reference has no layout surface — BASELINE.json
extension (storage layout for scan pruning).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave the low `bits` bits of k non-negative bigint
    columns: bit i of column j lands at position i·k + j. Pure
    shifts/masks — whole-stage codegen, engine-exact."""
    k = len(cols)
    if k == 0 or bits <= 0 or k * bits > 63:
        raise ValueError("need 1..k cols with k*bits <= 63")
    terms = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j)
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return reduce(lambda a, b: a + b, terms).cast("bigint")


def interleave_bits_sql(cols: list[str], bits: int = 16) -> str:
    """DuckDB twin of interleave_bits (same bit positions, `>> & <<` on
    bigints) — the oracle side of the exactness contract."""
    k = len(cols)
    terms = [
        f"((({c} >> {i}) & 1) << {i * k + j})"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16, key_col: str = "zkey"
) -> DataFrame:
    """Attach the Z-order key over `cols` (numeric, may be any range):
    each column is min-max normalized to [0, 2^bits − 1] with exact floor
    division (one 1-row min/max aggregate, broadcast back — the sanctioned
    scalar pattern), then bit-interleaved. Constant columns normalize to 0.

    Overflow bound: (v − min)·(2^bits − 1) must stay in int64, i.e. the
    column RANGE must be < 2^63/2^bits (~1.4e14 at bits=16) — far beyond
    any key domain this sees; ANSI mode (the Spark 4 default) makes a
    violation loud."""
    k = len(cols)
    if k == 0 or bits * k > 63:
        raise ValueError("need 1..k cols with k*bits <= 63")
    top = (1 << bits) - 1
    stats = df.agg(
        *[F.min(c).cast("bigint").alias(f"__mn_{j}") for j, c in enumerate(cols)],
        *[F.max(c).cast("bigint").alias(f"__mx_{j}") for j, c in enumerate(cols)],
    )
    with_stats = df.join(F.broadcast(stats))
    norm = [
        F.when(
            F.col(f"__mx_{j}") <= F.col(f"__mn_{j}"), F.lit(0).cast("bigint")
        ).otherwise(
            F.expr(
                f"((CAST(`{c}` AS BIGINT) - __mn_{j}) * {top})"
                f" div (__mx_{j} - __mn_{j})"
            )
        )
        for j, c in enumerate(cols)
    ]
    return with_stats.select(
        *df.columns, interleave_bits(norm, bits).alias(key_col)
    )


def zorder_key_sql(
    table: str, out_cols: list[str], cols: list[str], bits: int = 16,
    key_col: str = "zkey",
) -> str:
    """DuckDB twin of zorder_key: same 1-row stats, same floor-division
    normalization, same interleave."""
    top = (1 << bits) - 1
    mins = ", ".join(
        f"CAST(MIN({c}) AS BIGINT) AS mn_{j}" for j, c in enumerate(cols)
    )
    maxs = ", ".join(
        f"CAST(MAX({c}) AS BIGINT) AS mx_{j}" for j, c in enumerate(cols)
    )
    norm = [
        f"(CASE WHEN s.mx_{j} <= s.mn_{j} THEN CAST(0 AS BIGINT) ELSE "
        f"((CAST(t.{c} AS BIGINT) - s.mn_{j}) * {top}) // (s.mx_{j} - s.mn_{j})"
        f" END)"
        for j, c in enumerate(cols)
    ]
    sel = ", ".join(f"t.{c}" for c in out_cols)
    return f"""
    WITH s AS (SELECT {mins}, {maxs} FROM {table})
    SELECT {sel}, {interleave_bits_sql(norm, bits)} AS {key_col}
    FROM {table} t, s
    """


def zorder_layout(
    df: DataFrame, cols: list[str], num_files: int = 16, bits: int = 16
) -> DataFrame:
    """The write-side layout: key the frame and range-sort it into
    `num_files` Z-curve segments (one range shuffle; write each partition
    as one file and every file's min/max stats are tight in ALL `cols`).
    Returns the keyed frame sorted by (zkey), partitioned by contiguous
    key ranges — feed straight to .write.parquet()."""
    keyed = zorder_key(df, cols, bits)
    return keyed.repartitionByRange(num_files, F.col("zkey")).sortWithinPartitions(
        "zkey"
    )
