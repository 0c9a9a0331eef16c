"""Property-based tests (hypothesis): the hand-rolled operators whose
semantics have sharp edges — as-of join and deterministic dedup — checked
against brute-force reference implementations on randomized inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from s3_to_redshift_with_airflow_spark.operators.relational import (
    dedup_subset_deterministic,
)
from s3_to_redshift_with_airflow_spark.operators.timeseries import asof_join

# small key/time domains force collisions, ties, and empty matches
keys = st.integers(min_value=0, max_value=3)
times = st.integers(min_value=0, max_value=20)
values = st.integers(min_value=-5, max_value=5)

left_rows = st.lists(st.tuples(keys, times), min_size=0, max_size=12)
right_rows = st.lists(st.tuples(keys, times, values), min_size=0, max_size=12)


def _asof_reference(left, right):
    """Brute force: for each left row, the right row of the same key with the
    max rt <= lt; ties on rt broken by max value (the tiebreaker column)."""
    out = {}
    for i, (k, lt) in enumerate(left):
        matches = [(rt, v) for (rk, rt, v) in right if rk == k and rt <= lt]
        out[i] = max(matches) if matches else None
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(left=left_rows, right=right_rows)
def test_asof_join_matches_bruteforce(spark, left, right):
    # unique right (k, t) pairs: keep max value (mirrors right_tiebreaker)
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)] or [(None, None, None)],
        "row_id int, k int, t int",
    ).filter("row_id IS NOT NULL")
    rdf = spark.createDataFrame(
        right or [(None, None, None)], "k int, t int, v int"
    ).filter("k IS NOT NULL")

    got = {
        r["row_id"]: (None if r["asof_t"] is None else (r["asof_t"], r["asof_v"]))
        for r in asof_join(
            ldf, rdf, on="k", left_time="t", right_time="t",
            payload_cols=["v"], right_tiebreaker="v",
        ).collect()
    }
    expected = _asof_reference(left, right)
    assert got == expected


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(st.tuples(keys, values), min_size=0, max_size=15))
def test_dedup_survivor_is_deterministic_minimum(spark, rows):
    """dedup_subset_deterministic keeps exactly one row per key, and always
    the same one (the minimum over the non-key columns), independent of
    input order."""
    if not rows:
        return
    df = spark.createDataFrame(rows, "k int, v int")
    out = {r["k"]: r["v"] for r in dedup_subset_deterministic(df, ["k"]).collect()}
    expected = {}
    for k, v in rows:
        expected[k] = min(v, expected.get(k, v))
    assert out == expected

    rev = spark.createDataFrame(list(reversed(rows)), "k int, v int")
    out_rev = {
        r["k"]: r["v"] for r in dedup_subset_deterministic(rev, ["k"]).collect()
    }
    assert out_rev == out
