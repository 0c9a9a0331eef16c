"""Relational core operators.

Thin, well-named DataFrame combinators for the reference's operator inventory
(SURVEY §2.2-§2.7) where more than a one-liner of built-in API is involved.
Everything here compiles to pure Catalyst plans — no Python UDFs — so the
optimizer sees through every operator (pushdown, pruning, codegen).

Operators:
  - mode_per_group        — deterministic top-1-by-frequency (reference A4:
                            pandas mode at dags/etl/kpi_processor.py:90; ties →
                            smallest value, pinned via ORDER BY cnt DESC, key ASC)
  - topk_per_group        — general window top-k (O6)
  - dedup_full / dedup_subset_deterministic / drop_null_keys — D1-D3
                            (extract_metadata.py:120-121, extract_stream_data.py:206)
  - default_fill_missing  — P8 (load_to_redshift.py:246-251)
  - upsert_dataframe      — plan-level day-scoped delete+insert upsert (J3:
                            load_to_redshift.py:187-201) as anti-join + union

Scale notes: mode_per_group is two hash aggregations + one window, all keyed
on the group column — one shuffle on (group, value), one on group. The
count-then-window formulation beats `F.mode()` both for determinism (pinned
tie-break) and for skew (the heavy first agg is partial-aggregated map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mode_per_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Deterministic modal value per group.

    Pandas `mode().iloc[0]` (reference kpi_processor.py:90) returns the
    lexicographically smallest of the tied-most-frequent values; Spark's
    built-in `mode()` is nondeterministic on ties, so we pin the same rule:
    highest count first, then ascending value.

    Returns one row per group: group_cols + [out_col].
    """
    out_col = out_col or f"{value_col}_mode"
    counts = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__cnt").desc(), F.col(value_col).asc()
    )
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*group_cols, F.col(value_col).alias(out_col))
    )


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-k rows per group via row_number window (generalizes O6/A4).

    `order_cols` should end with a unique tiebreaker column for deterministic
    output. At scale this is a single shuffle on group_cols; for heavy groups
    AQE's skew handling applies, and k is enforced before any further join.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def dedup_full(df: DataFrame) -> DataFrame:
    """Full-row dedup (D1, extract_metadata.py:120): groupBy-all-columns
    distinct; partial aggregation makes this map-side cheap."""
    return df.dropDuplicates()


def dedup_subset_deterministic(df: DataFrame, keys: list[str]) -> DataFrame:
    """Subset-key dedup with a deterministic survivor (D2,
    extract_stream_data.py:206).

    Spark's `dropDuplicates(keys)` keeps an arbitrary row; the reference keeps
    the first in file order. For reproducible results we keep the row that is
    minimal over the remaining columns (total order), via min_by-style window.
    When only key columns exist this degenerates to `distinct()`.
    """
    extra = [c for c in df.columns if c not in keys]
    if not extra:
        return df.distinct()
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc_nulls_last() for c in extra])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def drop_null_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """D3 (extract_metadata.py:120-121): drop rows with any null key."""
    return df.na.drop(subset=keys)


def default_fill_missing(df: DataFrame, expected: dict[str, object]) -> DataFrame:
    """P8 (load_to_redshift.py:246-251): add absent expected columns with
    default literals (0 for numerics, '' for text in the reference)."""
    missing = {c: v for c, v in expected.items() if c not in df.columns}
    return df.withColumns({c: F.lit(v) for c, v in missing.items()}) if missing else df


def upsert_dataframe(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Plan-level upsert: rows of `target` whose key is absent from `source`,
    plus all of `source` — the same semantics as the reference's Redshift
    DELETE USING + INSERT SELECT transaction (J3, load_to_redshift.py:187-201),
    expressed as LEFT ANTI join + UNION for in-engine tables.

    The reference scopes the delete by (key, date_processed::date); callers
    wanting day-scoped idempotency include the date column in `keys`.
    At scale: anti-join shuffles on `keys` once; with a Delta/Iceberg sink the
    same semantics become a MERGE INTO (see sinks/jdbc_upsert.py for the
    warehouse path).
    """
    return target.join(source, on=keys, how="left_anti").unionByName(source)
