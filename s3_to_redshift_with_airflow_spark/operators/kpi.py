"""KPI pipeline — the reference's analytical core, Spark-first.

Re-expresses `compute_kpis()` (reference: dags/etl/kpi_processor.py:40-101):

    read staged CSVs → merge(stream, song, on=track_id)
                     → merge(·, user, on=user_id)        [inner ⨯2 star join]
                     → to_datetime(listen_time).dt.hour  [projection]
    genre_kpis:  groupby(track_genre).agg(count, mean)
    hourly_kpis: groupby(hour).agg(nunique, mode, distinct-ratio)

as one lazy DataFrame plan. Catalyst broadcast-joins the dimensions (songs,
users are small relative to the stream fact table), prunes unused dimension
columns (the reference carries user_name/age/country through the join unused —
kpi_processor.py:59), and runs both aggregations with partial+final hash
aggregation and whole-stage codegen.

Semantic traps pinned here (SURVEY §7.4):
  - inner joins silently drop orphan streams (kpi_processor.py:59) — preserved.
  - `top_artists` is the modal *track_id*, not an artist name
    (kpi_processor.py:90) — preserved, with pandas' tie-break (smallest value).
  - `hour` is hour-of-day (0-23) across all days (kpi_processor.py:61).

Scale notes (100 TB): the only big shuffle is the fact-table aggregation;
dims are broadcast so the star join is shuffle-free. countDistinct(user_id)
per hour is the expensive agg — Spark expands distincts into a two-phase
aggregate automatically; for approximate mode at extreme scale use
`approx_count_distinct` (exposed via `exact=False`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import mode_per_group


def enrich_streams(
    streams: DataFrame,
    songs: DataFrame,
    users: DataFrame,
    track_key: str = "track_id",
    user_key: str = "user_id",
    time_col: str = "listen_time",
    broadcast_dims: bool = True,
) -> DataFrame:
    """Star join: fact ⨝ song-dim ⨝ user-dim, inner semantics (J1), plus the
    hour-of-day projection (P2+P3).

    `broadcast_dims` forces BroadcastHashJoin on both dimensions — correct
    whenever the dims fit in executor memory (songs/users here); at dim sizes
    beyond broadcast threshold drop the hint and let AQE pick SMJ.
    """
    from .skew import fan_out

    song_side = F.broadcast(songs) if broadcast_dims else songs
    user_side = F.broadcast(users) if broadcast_dims else users
    # fan the fact out before the broadcast joins: the map-side join + hour
    # projection otherwise runs at the scan's parallelism (1 task for a
    # single-row-group file); no-op when the scan is already wide.
    return (
        fan_out(streams).join(song_side, on=track_key, how="inner")
        .join(user_side, on=user_key, how="inner")
        .withColumn("hour", F.hour(F.col(time_col).cast("timestamp")))
    )


def genre_kpis(
    enriched: DataFrame,
    genre_col: str = "track_genre",
    track_key: str = "track_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Per-genre KPIs (reference kpi_processor.py:69-72):
    listen_count = count(track_id), avg_duration = mean(duration_ms).

    The average is computed as an exact decimal sum divided once in double —
    bit-deterministic regardless of partitioning/accumulation order (a raw
    double sum is order-dependent, which breaks reproducible results across
    runs and engines).
    """
    dur = F.col(duration_col).cast("decimal(27,6)")
    return enriched.groupBy(genre_col).agg(
        F.count(track_key).alias("listen_count"),
        (F.sum(dur).cast("double") / F.count(duration_col)).alias("avg_duration"),
    )


def hourly_kpis(
    enriched: DataFrame,
    hour_col: str = "hour",
    user_key: str = "user_id",
    track_key: str = "track_id",
    exact: bool = True,
) -> DataFrame:
    """Per-hour KPIs (reference kpi_processor.py:88-92):
    unique_listeners, top_artists (deterministic modal track), diversity index.

    exact=False swaps countDistinct for approx_count_distinct — the scalable
    variant for extreme cardinalities (HLL sketch, no distinct expansion).
    """
    cd = F.countDistinct if exact else (lambda c: F.approx_count_distinct(c))
    base = enriched.groupBy(hour_col).agg(
        cd(user_key).alias("unique_listeners"),
        (cd(track_key).cast("double") / F.count(track_key)).alias(
            "track_diversity_index"
        ),
    )
    top = mode_per_group(
        enriched.select(hour_col, track_key), [hour_col], track_key, "top_artists"
    )
    return base.join(top, on=hour_col, how="left").select(
        hour_col, "unique_listeners", "top_artists", "track_diversity_index"
    )


def prepare_hourly_for_warehouse(
    hourly: DataFrame,
    anchor_date: str | None = None,
    expected_numeric: tuple[str, ...] = ("total_streams", "unique_songs", "avg_stream_duration"),
    expected_text: tuple[str, ...] = ("top_artists",),
) -> DataFrame:
    """Shape hourly KPIs for the warehouse table, replicating the reference
    loader's derivations (load_to_redshift.py:232-261):

      P6 — total_streams defaults to unique_listeners * 2 when absent;
      P8 — absent expected columns are default-filled (0 numeric, '' text);
      P7 — the integer hour-of-day is re-anchored onto a calendar day as a
           TIMESTAMP (reference uses today's midnight UTC; pass `anchor_date`
           for a deterministic anchor — None reproduces the reference's
           current-day behavior).

    Pure narrow projections — no shuffle; the warehouse keying
    (PRIMARY KEY (hour, date_processed), DISTKEY(hour)) is handled by the
    upsert sink (sinks/jdbc_upsert.py).
    """
    out = hourly
    if "total_streams" not in out.columns:
        out = out.withColumn(
            "total_streams", (F.col("unique_listeners") * F.lit(2)).cast("bigint")
        )
    for c in expected_numeric:
        if c not in out.columns:
            out = out.withColumn(c, F.lit(0).cast("bigint"))
    for c in expected_text:
        if c not in out.columns:
            out = out.withColumn(c, F.lit(""))
    anchor = (
        F.lit(anchor_date).cast("timestamp")
        if anchor_date is not None
        else F.date_trunc("day", F.current_timestamp())
    )
    return out.withColumn(
        "hour_ts",
        F.to_timestamp(anchor + F.make_interval(hours=F.col("hour").cast("int"))),
    )
