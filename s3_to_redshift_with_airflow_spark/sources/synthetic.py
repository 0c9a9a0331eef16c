"""Deterministic synthetic-events DataSource (Spark 4 Python DataSource API).

A custom batch source registered as ``format("synthetic_events")`` that
GENERATES the events table instead of reading storage — the load-generation
path for benchmarking the engine at arbitrary scale without materializing
input files (want a 10-TB shakeout run? set rows_per_partition ×
num_partitions; nothing is written anywhere).

Determinism contract: every field of row (p, i) is a pure function of
(seed, p, i) via md5 — the same engine-portable hash discipline the
registry's sampling/sharding operators use — so two reads with identical
options are row-identical regardless of cluster size, task retries, or
scheduling order (a retried task regenerates exactly its partition).

Scale shape: one InputPartition per requested partition; partitions
generate independently with zero coordination and zero shuffle, so the
source parallelizes to any executor count. Rows are yielded through the
Arrow batch path of the Python DataSource API. This is deliberately a
Python-worker source (the API's design); it is a TEST/LOAD-GEN surface,
not a hot-path scan — production scans stay on the JVM parquet/CSV/ORC
readers in sources/readers.py.

Reference parity: the reference synthesizes nothing, but its stream files
(data/streams/streams*.csv: user_id, track_id, listen_time) are exactly
what this generates — schema-compatible with the engine's streams role
mapping, plus event_type/value columns matching the driver's events table.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_TYPES = ["play", "pause", "skip", "like", "share"]

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("track_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _h(seed: int, p: int, i: int, field: str) -> int:
    """64-bit md5-derived value — the portable deterministic hash."""
    raw = hashlib.md5(f"{seed}:{p}:{i}:{field}".encode()).digest()
    return int.from_bytes(raw[:8], "big")


class _Partition(InputPartition):
    def __init__(self, p: int):
        self.p = p


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows_per_partition", 1000))
        self.n_parts = int(options.get("num_partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("n_users", 1000))
        self.n_tracks = int(options.get("n_tracks", 200))
        self.start = datetime.fromisoformat(
            options.get("start_ts", "2024-06-25T00:00:00+00:00")
        )

    def partitions(self):
        return [_Partition(p) for p in range(self.n_parts)]

    def read(self, partition):
        p, seed = partition.p, self.seed
        for i in range(self.rows):
            uid = _h(seed, p, i, "u") % self.n_users
            tid = _h(seed, p, i, "t") % self.n_tracks
            et = EVENT_TYPES[_h(seed, p, i, "e") % len(EVENT_TYPES)]
            # events spread over 24h, second granularity, per-partition offset
            ts = self.start + timedelta(seconds=int(_h(seed, p, i, "s") % 86_400))
            value = (_h(seed, p, i, "v") % 10_000) / 100.0
            yield (
                p * self.rows + i,
                uid,
                tid,
                et,
                ts.astimezone(timezone.utc).replace(tzinfo=None),
                value,
            )


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    """Idempotent registration: spark.read.format('synthetic_events')."""
    spark.dataSource.register(SyntheticEventsDataSource)


# --- streaming half of the API ---------------------------------------------


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Deterministic micro-batch stream: batch b carries rows
    (seed, p=b, i) for i < rows_per_batch — the same generator as the
    batch reader keyed by batch number, so replaying offsets [a, b)
    after a failure regenerates BYTE-identical batches (the property
    exactly-once sinks need from a replayable source; cf. the
    file-source contract streaming/pipeline.py relies on).

    Offsets are {"batch": n}; readBetweenOffsets re-derives any range
    deterministically, so no state beyond the offset is kept anywhere.
    """

    def __init__(self, options):
        self.rows = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("n_users", 1000))
        self.n_tracks = int(options.get("n_tracks", 200))
        self.start_ts = datetime.fromisoformat(
            options.get("start_ts", "2024-06-25T00:00:00+00:00")
        )

    def initialOffset(self):
        return {"batch": 0}

    def _rows(self, b: int):
        for i in range(self.rows):
            uid = _h(self.seed, b, i, "u") % self.n_users
            tid = _h(self.seed, b, i, "t") % self.n_tracks
            et = EVENT_TYPES[_h(self.seed, b, i, "e") % len(EVENT_TYPES)]
            ts = self.start_ts + timedelta(
                seconds=int(_h(self.seed, b, i, "s") % 86_400)
            )
            value = (_h(self.seed, b, i, "v") % 10_000) / 100.0
            yield (
                b * self.rows + i,
                uid,
                tid,
                et,
                ts.astimezone(timezone.utc).replace(tzinfo=None),
                value,
            )

    def read(self, start):
        # a LIST, not a generator: the simple-reader protocol pickles the
        # prefetched rows so uncommitted batches can be replayed
        b = start["batch"]
        return list(self._rows(b)), {"batch": b + 1}

    def readBetweenOffsets(self, start, end):
        for b in range(start["batch"], end["batch"]):
            yield from self._rows(b)

    def commit(self, end):
        pass  # nothing to clean up: batches are regenerated, not stored


def _stream_reader(self, schema):
    return SyntheticEventsStreamReader(self.options)


SyntheticEventsDataSource.simpleStreamReader = _stream_reader


# --- JVM-side synthetic corpora (scale-study load generation) --------------
#
# Unlike the Python DataSource above (the API showcase, Python-worker
# bound at ~2M rows/s), these generate entirely inside whole-stage codegen
# from spark.range() — no Python, no storage, no shuffle — so they can
# drive 10-100x scale studies where the measurement must be the OPERATOR,
# not the generator. Same md5 determinism contract: every field is a pure
# function of (seed, row id), reproducible bit-for-bit in DuckDB SQL (the
# synthetic_docs_stats registry query pins this), so scale-study inputs
# are portable and re-runnable anywhere.


def _md60(col):
    from pyspark.sql import functions as F

    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def synthetic_documents(
    spark,
    n_docs: int,
    group: int = 10,
    vocab: int = 5000,
    min_tokens: int = 30,
    tok_spread: int = 30,
    seed: int = 11,
):
    """Deterministic synthetic documents table (doc_id, text), generated
    JVM-side at any scale. Docs come in near-dup groups of `group`: all
    members share the base text (30-59 'w<k>' tokens drawn from a
    `vocab`-word vocabulary by md5 of (seed, base, position)) and differ
    only in a trailing per-copy salt token 'c<i>' — so MinHash/SimHash
    find each group (Jaccard ≈ (L-1)/(L+1) ≈ 0.94 for L≈30 shingle sets)
    and the expected near-dup pair count grows LINEARLY with n_docs
    (group size is constant), which is what makes throughput curves
    comparable across scales. Set group=1 for a dup-free corpus."""
    from pyspark.sql import functions as F

    if n_docs <= 0 or group <= 0 or vocab <= 0 or min_tokens <= 0:
        raise ValueError("n_docs, group, vocab, min_tokens must be positive")
    base = F.expr(f"id div {group}").cast("string")
    length = (
        F.lit(min_tokens)
        + _md60(F.concat(F.lit(f"len:{seed}:"), base)) % tok_spread
    ).cast("int")
    toks = F.transform(
        F.sequence(F.lit(1), length),
        lambda j: F.concat(
            F.lit("w"),
            (
                _md60(
                    F.concat(
                        F.lit(f"tok:{seed}:"), base, F.lit(":"), j.cast("string")
                    )
                )
                % vocab
            ).cast("string"),
        ),
    )
    text = F.concat(
        F.array_join(toks, " "),
        F.lit(" c"),
        (F.col("id") % group).cast("string"),
    )
    return spark.range(n_docs).select(F.col("id").alias("doc_id"), text.alias("text"))


def synthetic_documents_sql(
    n_docs: int,
    group: int = 10,
    vocab: int = 5000,
    min_tokens: int = 30,
    tok_spread: int = 30,
    seed: int = 11,
) -> str:
    """DuckDB SQL regenerating synthetic_documents bit-for-bit (the oracle
    side of the determinism contract)."""
    h = lambda s: f"('0x' || substr(md5({s}), 1, 15))::UBIGINT"  # noqa: E731
    base = f"(r.range // {group})::VARCHAR"
    len_key = f"'len:{seed}:' || {base}"
    tok_key = f"'tok:{seed}:' || {base} || ':' || j::VARCHAR"
    length = f"({min_tokens} + {h(len_key)} % {tok_spread})::BIGINT"
    word = f"'w' || ({h(tok_key)} % {vocab})::VARCHAR"
    return f"""
    SELECT r.range AS doc_id,
           array_to_string(
             list_transform(generate_series(1, {length}), j -> {word}), ' ')
             || ' c' || (r.range % {group})::VARCHAR AS text
    FROM range({n_docs}) r
    """
