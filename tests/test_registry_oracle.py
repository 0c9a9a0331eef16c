"""Local replica of the driver's correctness gate at sf0.001 (fast).

Every registry query with an oracle must match DuckDB exactly: column set,
row count, and values (order-insensitive). This mirrors the driver's
CORRECTNESS check so regressions surface in `pytest` before a round ends.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from s3_to_redshift_with_airflow_spark.plans import REGISTRY
from s3_to_redshift_with_airflow_spark.sources.readers import TESTDATA_TABLES, table_path

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_SMOKE, t)}')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


# Queries whose sf0.001 oracle replica takes >= 5 s each (measured with
# --durations=0, round 12): marked slow so the default `pytest tests/`
# finishes inside a CI/verify window. SPARK_GRAFT_RUN_SLOW=1 runs them;
# tools/check_oracle.py covers every query regardless.
_SLOW_ORACLE = {
    "ann_recall_report",
    "containment_neardup",
    "curation_audit",
    "curation_funnel",
    "curation_funnel_trimmed",
    "dedup_rate_report",
    "doc_dedup_clusters",
    "filtered_ann_recall_report",
    "filtered_ivf_pq_ann_topk",
    "incremental_neardup",
    "ivf_pq_index_retrain",
    "kfold_split",
    "leakage_safe_split",
    "minhash_neardup",
    "neardup_survivors",
    "ngram_neardup",
    "repetition_score",
    "streaming_dedup_gate",
    "streaming_neardup_gate",
    "streaming_synthetic_agg",
    "winnow_fingerprint",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_ORACLE else n
        for n in sorted(REGISTRY)
    ],
)
def test_query_matches_oracle(name, spark, oracle_con):
    spec = REGISTRY[name]
    result = spec.fn(spark, SF_SMOKE).toPandas()
    if spec.oracle is None:
        assert len(result) >= 0  # rows-only contract: must run and be stable
        return
    expected = oracle_con.execute(spec.oracle).fetchdf()
    a, b = normalize(result), normalize(expected)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"rowcount {len(a)} != {len(b)}"
    # Dtype-strict, matching tools/check_oracle.py: the driver's value hash
    # is dtype-sensitive, so a lenient check here would let width mismatches
    # (e.g. DuckDB HUGEINT sums vs Spark BIGINT) escape to round scoring.
    pd.testing.assert_frame_equal(a, b, check_dtype=True, check_exact=True)


def test_readme_counts_match_registry():
    """README's '<N> queries, <M> with exact DuckDB oracles' claim is
    DERIVED from the registry here, so the numbers cannot silently drift
    when queries land (ADVICE r4)."""
    from pathlib import Path

    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    total = len(REGISTRY)
    oracles = sum(1 for s in REGISTRY.values() if s.oracle)
    readme = (Path(__file__).resolve().parent.parent / "README.md").read_text()
    claim = f"{total} queries, {oracles} with exact DuckDB"
    assert claim in readme, (
        f"README is stale: expected the sentence fragment {claim!r} "
        f"(registry has {total} queries / {oracles} oracles)"
    )
    # the rows-only COUNT is derived too — VERDICT r8 'What's wrong' #1
    # was exactly this word drifting while the numerics stayed pinned
    rows_only = f"the {total - oracles} rows-only entries"
    assert rows_only in readme, (
        f"README is stale: expected {rows_only!r} "
        f"(registry has {total - oracles} rows-only queries)"
    )
