"""Explicit StructType schemas for the engine's logical data model.

The reference infers every schema at read time (pandas `read_csv`, reference:
dags/etl/extract_stream_data.py:67) and validates afterwards against a
hand-written registry of required/optional columns and allowed dtypes
(reference: dags/etl/schema_check.py:27-52). Our engine applies explicit
schemas at scan time — inference is O(file) extra work and nondeterministic at
scale — and keeps the same declarative validation registry (see
operators/validation.py) for the errors/warnings semantics.

Music-domain tables (the reference's database, SURVEY §1.2):
  users   — user_id, user_name, user_age, user_country, created_at
  songs   — track_id, track_name, artists, track_genre, duration_ms
  streams — user_id, track_id, listen_time (+ source_file lineage)

Derived: genre_kpis, hourly_kpis (see operators/kpi.py).
"""

from __future__ import annotations

from pyspark.sql import types as T

USERS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("user_name", T.StringType(), True),
        T.StructField("user_age", T.IntegerType(), True),
        T.StructField("user_country", T.StringType(), True),
        T.StructField("created_at", T.DateType(), True),
    ]
)

SONGS_SCHEMA = T.StructType(
    [
        T.StructField("track_id", T.StringType(), True),
        T.StructField("track_name", T.StringType(), True),
        T.StructField("artists", T.StringType(), True),
        T.StructField("track_genre", T.StringType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

STREAMS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("track_id", T.StringType(), True),
        T.StructField("listen_time", T.TimestampType(), True),
    ]
)

GENRE_KPIS_SCHEMA = T.StructType(
    [
        T.StructField("track_genre", T.StringType(), True),
        T.StructField("listen_count", T.LongType(), False),
        T.StructField("avg_duration", T.DoubleType(), True),
    ]
)

HOURLY_KPIS_SCHEMA = T.StructType(
    [
        T.StructField("hour", T.IntegerType(), True),
        T.StructField("unique_listeners", T.LongType(), False),
        T.StructField("top_artists", T.StringType(), True),
        T.StructField("track_diversity_index", T.DoubleType(), True),
    ]
)

# The 15-genre whitelist the reference validates against (warn-only;
# reference: dags/etl/schema_check.py:176-181 — "accoustic" sic).
VALID_GENRES = [
    "rock", "pop", "jazz", "classical", "hip-hop", "electronic", "country",
    "r&b", "folk", "blues", "accoustic", "metal", "reggae", "latin", "world",
]

# Validation registry mirroring reference dags/etl/schema_check.py:27-52.
# dtypes are Spark simpleString names; membership is warn-only (V2),
# required-column absence and empty relations are errors (V1, V3).
VALIDATION_RULES: dict[str, dict] = {
    "users": {
        "required_columns": ["user_id", "user_name"],
        "optional_columns": ["user_age", "user_country", "created_at"],
        "data_types": {
            "user_id": ["bigint", "int", "string"],
            "user_name": ["string"],
            "user_age": ["bigint", "int", "double"],
            "user_country": ["string"],
            "created_at": ["date", "string", "timestamp"],
        },
        "key_columns": ["user_id"],
    },
    "songs": {
        "required_columns": ["track_id", "track_name", "artists"],
        "optional_columns": ["track_genre", "duration_ms"],
        "data_types": {
            "track_id": ["string"],
            "track_name": ["string"],
            "artists": ["string"],
            "track_genre": ["string"],
            "duration_ms": ["bigint", "int", "double"],
        },
        "key_columns": ["track_id"],
    },
    "streams": {
        "required_columns": ["user_id", "track_id", "listen_time"],
        "optional_columns": ["source_file"],
        "data_types": {
            "user_id": ["bigint", "int", "string"],
            "track_id": ["string"],
            # The reference declares listen_time numeric while the data is a
            # timestamp string — kept warn-only for parity (schema_check.py:49).
            "listen_time": ["bigint", "double", "timestamp", "string"],
        },
        "key_columns": ["user_id", "track_id"],
    },
}
