"""Property-based tests (hypothesis): the hand-rolled operators whose
semantics have sharp edges — as-of join and deterministic dedup — checked
against brute-force reference implementations on randomized inputs."""

from __future__ import annotations

import pytest

# Every case here replays a randomized model against the engine across
# multiple seeds — the multi-minute property suite VERDICT r11 next #3
# names; deselected by default, SPARK_GRAFT_RUN_SLOW=1 runs it.
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

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


intervals_rows = st.lists(
    st.tuples(keys, times, st.integers(min_value=0, max_value=8)),  # (k, start, len)
    min_size=0,
    max_size=10,
)
bucket_sizes = st.sampled_from([1, 2, 3, 7])


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(points=left_rows, intervals=intervals_rows, bucket=bucket_sizes)
def test_range_join_matches_bruteforce(spark, points, intervals, bucket):
    from s3_to_redshift_with_airflow_spark.operators.timeseries import range_join
    from pyspark.sql import functions as F

    pdf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(points)] or [(None, None, None)],
        "pid int, k int, t int",
    ).filter("pid IS NOT NULL")
    idf = spark.createDataFrame(
        [(j, k, s, s + ln) for j, (k, s, ln) in enumerate(intervals)]
        or [(None, None, None, None)],
        "iid int, k int, s int, e int",
    ).filter("iid IS NOT NULL")

    # integer second timestamps (range_join buckets via unix_micros)
    p = pdf.select("pid", "k", F.timestamp_seconds("t").alias("t"))
    i = idf.select(
        "iid", "k",
        F.timestamp_seconds("s").alias("s"),
        F.timestamp_seconds("e").alias("e"),
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            p, i, point_col="t", start_col="s", end_col="e",
            keys=["k"], bucket_seconds=bucket,
        ).collect()
    }
    expected = {
        (pid, jid)
        for pid, (pk, pt) in enumerate(points)
        for jid, (ik, s, ln) in enumerate(intervals)
        if pk == ik and s <= pt <= s + ln
    }
    assert got == expected


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    target=st.lists(st.tuples(keys, values), min_size=0, max_size=10),
    updates=st.lists(st.tuples(keys, values), min_size=0, max_size=6),
)
def test_upsert_dataframe_matches_dict_semantics(spark, target, updates):
    from s3_to_redshift_with_airflow_spark.operators.relational import (
        dedup_subset_deterministic,
        upsert_dataframe,
    )

    tgt = dedup_subset_deterministic(
        spark.createDataFrame(target or [(None, None)], "k int, v int").filter(
            "k IS NOT NULL"
        ),
        ["k"],
    )
    upd = dedup_subset_deterministic(
        spark.createDataFrame(updates or [(None, None)], "k int, v int").filter(
            "k IS NOT NULL"
        ),
        ["k"],
    )
    got = {r["k"]: r["v"] for r in upsert_dataframe(tgt, upd, ["k"]).collect()}

    expected = {}
    for k, v in target:
        expected[k] = min(v, expected.get(k, v))
    upd_d = {}
    for k, v in updates:
        upd_d[k] = min(v, upd_d.get(k, v))
    expected.update(upd_d)
    assert got == expected


def test_range_join_left_preserves_unmatched_points(spark):
    """ADVICE r1: how='left' must null-extend points with no containing
    interval (the containment predicate lives in the join condition, not a
    post-join filter that would silently drop them)."""
    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.timeseries import range_join

    p = spark.createDataFrame(
        [(1, 100), (2, 5000)], "pid int, t int"
    ).select("pid", F.timestamp_seconds("t").alias("t"))
    i = spark.createDataFrame(
        [(10, 50, 200)], "iid int, s int, e int"
    ).select(
        "iid", F.timestamp_seconds("s").alias("s"), F.timestamp_seconds("e").alias("e")
    )
    rows = {
        r["pid"]: r["iid"]
        for r in range_join(
            p, i, point_col="t", start_col="s", end_col="e", how="left"
        ).collect()
    }
    assert rows == {1: 10, 2: None}  # pid=2 survives, null-extended


# SCD2 vs a dictionary model: open versions are a key->value map; a delta
# closes changed keys and opens new versions. NULL values included to pin
# the null-safe change detection.
scd_vals = st.one_of(st.none(), st.integers(min_value=0, max_value=3))
scd_dim = st.dictionaries(keys=st.integers(0, 5), values=scd_vals, max_size=6)
scd_upd = st.dictionaries(keys=st.integers(0, 5), values=scd_vals, max_size=6)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(dim=scd_dim, upd=scd_upd)
def test_scd2_matches_dict_model(spark, dim, upd):
    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.relational import scd2_apply

    T0, EFF = "2024-01-01 00:00:00", "2024-06-01 00:00:00"
    dim_df = spark.createDataFrame(
        [(k, v) for k, v in dim.items()] or [(None, None)], "k int, v int"
    ).filter("k IS NOT NULL").select(
        "k", "v",
        F.lit(T0).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    upd_df = spark.createDataFrame(
        [(k, v) for k, v in upd.items()] or [(None, None)], "k int, v int"
    ).filter("k IS NOT NULL")

    got = {
        (r["k"], r["v"], str(r["valid_from"]), str(r["valid_to"]))
        for r in scd2_apply(dim_df, upd_df, ["k"], ["v"], EFF).collect()
    }

    expected = set()
    for k, v in dim.items():
        if k in upd and upd[k] != v:
            expected.add((k, v, T0, EFF))            # closed old version
            expected.add((k, upd[k], EFF, "None"))   # new open version
        else:
            expected.add((k, v, T0, "None"))         # untouched / no-op
    for k, v in upd.items():
        if k not in dim:
            expected.add((k, v, EFF, "None"))        # brand-new key
    assert got == expected


# --- chunk_dedup: hash-keyed survivor selection vs brute force -------------

_texts = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=8).map(
        " ".join
    ),
    min_size=1,
    max_size=6,
)


def _chunk_dedup_reference(rows, n):
    """Brute force on raw text keys: first occurrence by (doc_id, pos) of
    each chunk survives; documents reassemble survivors in position order."""
    import math
    import re

    chunks = {}
    for did, text in rows:
        toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
        chunks[did] = [
            " ".join(toks[i * n : (i + 1) * n]) for i in range(math.ceil(len(toks) / n))
        ]
    first = {}
    for did, cl in chunks.items():
        for pos, c in enumerate(cl):
            if c not in first or (did, pos) < first[c]:
                first[c] = (did, pos)
    return {
        did: (
            " ".join(c for pos, c in enumerate(cl) if first[c] == (did, pos)),
            sum(1 for pos, c in enumerate(cl) if first[c] == (did, pos)),
            sum(1 for pos, c in enumerate(cl) if first[c] != (did, pos)),
        )
        for did, cl in chunks.items()
    }


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=_texts)
def test_chunk_dedup_matches_bruteforce(spark, texts):
    """The 128-bit hash-keyed survivor shuffle must be output-identical to
    the raw-text-keyed definition (collision probability ~2^-129/pair)."""
    from s3_to_redshift_with_airflow_spark.operators.dedup import chunk_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    got = {
        r["doc_id"]: (r["clean_text"], r["kept_chunks"], r["dropped_chunks"])
        for r in chunk_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"), chunk_tokens=2
        ).collect()
    }
    assert got == _chunk_dedup_reference(rows, 2)


# --- integer k-means vs pure-Python reference --------------------------------

import math

vec4 = st.lists(
    st.floats(min_value=-8, max_value=8, allow_nan=False, width=64),
    min_size=4, max_size=4,
)
corpora = st.lists(vec4, min_size=3, max_size=10)


def _kmeans_reference(vecs, k, n_iter):
    """Pure-Python replica of operators/clustering.kmeans_int8 (same
    quantization, same exact-integer score, same d²=score/n² argmin with
    cid tie-break, same min-id seeding and empty-cluster drop)."""

    def quant(v):
        m = max(abs(x) for x in v)
        s = 127.0 / m if m > 0 else 0.0
        if math.isinf(s):  # engine contract: overflow-scale ⇒ zero vector
            s = 0.0
        return [min(max(math.floor(x * s + 0.5), -127), 127) for x in v]

    q = {i: quant(v) for i, v in vecs}
    xx = {i: sum(c * c for c in qv) for i, qv in q.items()}
    ids = sorted(q)
    cents = {cid: (q[i], 1) for cid, i in enumerate(ids[: k])}
    assign = {}
    for it in range(n_iter):
        assign = {}
        for i in ids:
            best = None
            for cid, (s, n) in sorted(cents.items()):
                num = (
                    n * n * xx[i]
                    - 2 * n * sum(a * b for a, b in zip(q[i], s))
                    + sum(c * c for c in s)
                )
                key = (num / float(n * n), cid)
                if best is None or key < best[0]:
                    best = (key, num, n)
            assign[i] = (best[0][1], best[1], best[2])
        if it < n_iter - 1:
            new = {}
            for i, (cid, _, _) in assign.items():
                s, n = new.get(cid, ([0] * len(q[i]), 0))
                new[cid] = ([a + b for a, b in zip(s, q[i])], n + 1)
            cents = new
    return assign


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(vecs=corpora)
def test_kmeans_int8_matches_python_reference(spark, vecs):
    from s3_to_redshift_with_airflow_spark.operators.clustering import kmeans_int8

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = {
        r["vec_id"]: (r["cluster"], r["dist_score"], r["centroid_n"])
        for r in kmeans_int8(df, k=3, n_iter=2, dim=4).collect()
    }
    expected = _kmeans_reference(rows, k=3, n_iter=2)
    assert got == expected


# --- sliding-window chunking vs pure-Python reference ------------------------

import re

ascii_text = st.text(
    alphabet=" abcdeF 012.,", min_size=0, max_size=60
)


def _chunks_reference(text, W, S):
    toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    n = len(toks)
    out = []
    start, idx = 0, 0
    while start == 0 or start <= n - W + S - 1:
        piece = toks[start : start + W]
        out.append((idx, " ".join(piece), len(piece)))
        idx += 1
        start += S
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(ascii_text, min_size=1, max_size=4))
def test_chunk_documents_matches_python_reference(spark, texts):
    from s3_to_redshift_with_airflow_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {}
    for r in chunk_documents(df, chunk_tokens=5, stride=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["chunk_n_tokens"])
        )
    for doc_id in got:
        got[doc_id].sort()
    expected = {
        i: _chunks_reference(t, 5, 2) for i, t in enumerate(texts)
    }
    assert got == expected


# --- weighted bottom-k sampling vs pure-Python reference ---------------------

import hashlib


def _weighted_sample_reference(rows, k=5):
    """(doc_id, source, n_chars) → per-source k smallest h/w with doc_id
    tie-break; h = first 15 hex chars of md5(str(doc_id))."""
    out = {}
    for doc_id, source, n_chars in rows:
        if n_chars <= 0:
            continue
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        key = (float(h) / float(n_chars), doc_id)
        out.setdefault(source, []).append((key, doc_id, n_chars))
    result = set()
    for source, lst in out.items():
        for key, doc_id, n_chars in sorted(lst)[:k]:
            result.add((doc_id, source, n_chars))
    return result


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),      # doc_id (dups dropped)
            st.sampled_from(["a", "b"]),                 # source
            st.integers(min_value=0, max_value=10**9),   # n_chars (0 excluded)
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda r: r[0],
    )
)
def test_weighted_sample_matches_python_reference(spark, rows):
    import os
    import tempfile

    from s3_to_redshift_with_airflow_spark.plans import query_map

    df = spark.createDataFrame(
        [(i, "t", "en", s, n) for i, s, n in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            (r["doc_id"], r["source"], r["n_chars"])
            for r in query_map()["weighted_sample"](spark, d).collect()
        }
    assert got == _weighted_sample_reference(rows)


# --- integer PageRank vs pure-Python reference ------------------------------

_pr_edges = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=40,
)


def _py_pagerank_ref(edges, n_iter, scale=1_000_000, damp=850_000):
    e = set(edges)
    nodes = {u for u, _ in e} | {v for _, v in e}
    deg = {}
    for u, _ in e:
        deg[u] = deg.get(u, 0) + 1
    rank = {n: scale for n in nodes}
    for _ in range(n_iter):
        in_sum = {n: 0 for n in nodes}
        for u, v in e:
            in_sum[v] += rank[u] // deg[u]
        rank = {n: (scale - damp) + (damp * in_sum[n]) // scale for n in nodes}
    return rank


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(edges=_pr_edges, n_iter=st.integers(1, 4))
def test_pagerank_matches_reference_on_random_graphs(spark, edges, n_iter):
    """pagerank_scaled == the pure-Python floor-division model on arbitrary
    directed graphs (self-loops, dangling nodes, multi-edges collapse) for
    any iteration count — the bigint pipeline introduces no engine drift."""
    from s3_to_redshift_with_airflow_spark.operators.graph import pagerank_scaled

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank_scaled(df, n_iter=n_iter).collect()
    }
    assert got == _py_pagerank_ref(edges, n_iter)


# --- hashed linear classifier vs pure-Python reference ----------------------

_clf_texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("ab c\tXY1.")), min_size=0, max_size=24
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=_clf_texts)
def test_classifier_matches_reference_on_random_texts(spark, texts):
    """hashed_linear_classify == the pure-Python model for arbitrary
    whitespace/case/empty-token shapes (normalization, hashing, margin and
    label all replicated)."""
    import hashlib
    import re

    from s3_to_redshift_with_airflow_spark.operators.classify import (
        hashed_linear_classify,
    )

    def md5i(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["margin"], r["label"])
        for r in hashed_linear_classify(df).collect()
    }
    want = {}
    for doc_id, text in rows:
        toks = [
            t
            for t in re.sub(r"\s+", " ", text.strip().lower()).split(" ")
            if t
        ]
        if not toks:
            continue
        margin = sum(
            md5i(f"w:7:{md5i('t:7:' + t) % 4096}") % 1001 - 500 for t in toks
        )
        want[doc_id] = (
            len(toks),
            margin,
            "keep" if margin >= 0 else "drop",
        )
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(xs=st.lists(st.integers(min_value=1, max_value=10**12),
                   min_size=1, max_size=20, unique=True))
def test_log2_fp_sql_matches_python_on_both_engines(spark, xs):
    """The fixed-point log2 primitive behind the classifier trainer: the
    Spark and DuckDB SQL renderings must both equal the integer reference
    (bit_length exponent + floored octave interpolation) for arbitrary
    positive bigints — the portability contract that lets the trainer
    carry an exact value oracle."""
    import duckdb

    from s3_to_redshift_with_airflow_spark.operators.classify import log2_fp_sql

    def ref(x: int, s: int = 65536) -> int:
        m = x.bit_length() - 1
        p = 1 << m
        return m * s + ((x - p) * s) // p

    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got_spark = {
        r["x"]: r["lg"]
        for r in df.selectExpr("x", f"{log2_fp_sql('x')} AS lg").collect()
    }
    con = duckdb.connect()
    vals = ", ".join(f"({x})" for x in xs)
    got_duck = dict(
        con.execute(
            f"SELECT x, {log2_fp_sql('x', dialect='duck')} FROM "
            f"(VALUES {vals}) t(x)"
        ).fetchall()
    )
    want = {x: ref(x) for x in xs}
    assert got_spark == want
    assert got_duck == want


def test_gap_fill_matches_reference_semantics(spark):
    """gap_fill densifies per-key grids, zero-fills additive columns,
    forward-fills level columns (leading gaps stay NULL), and marks
    synthesized rows."""
    import datetime as dt

    from s3_to_redshift_with_airflow_spark.operators.timeseries import gap_fill

    h = lambda i: dt.datetime(2024, 1, 1, i, 0, 0)  # noqa: E731
    rows = [
        ("a", h(0), 2, 5.0),
        ("a", h(3), 1, 7.0),
        ("b", h(1), 4, None),  # level never observed -> ffill stays NULL
    ]
    df = spark.createDataFrame(
        rows, "k string, t timestamp, n long, v double"
    )
    out = {
        (r["k"], r["t"].hour): (r["observed"], r["n"], r["v"])
        for r in gap_fill(
            df, key="k", time_col="t", value_cols={"n": "zero", "v": "ffill"}
        ).collect()
    }
    assert out == {
        ("a", 0): (True, 2, 5.0),
        ("a", 1): (False, 0, 5.0),
        ("a", 2): (False, 0, 5.0),
        ("a", 3): (True, 1, 7.0),
        ("b", 1): (True, 4, None),
    }
    for bad in ({}, {"n": "mean"}):
        try:
            gap_fill(df, "k", "t", bad)
            raise AssertionError(f"accepted {bad}")
        except ValueError:
            pass


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(
    old=st.dictionaries(keys, st.tuples(values, st.booleans()), max_size=8),
    new=st.dictionaries(keys, st.tuples(values, st.booleans()), max_size=8),
)
def test_diff_tables_matches_dict_model(spark, old, new):
    """diff_tables vs the obvious dict model: keys only in new -> added,
    only in old -> removed, in both with differing attrs -> changed,
    identical -> absent (NULL-safe on the nullable attr)."""
    from s3_to_redshift_with_airflow_spark.operators.relational import diff_tables

    def rows(d):
        return [(k, v, None if b else "s") for k, (v, b) in d.items()]

    schema = "k long, v long, s string"
    df_old = spark.createDataFrame(rows(old), schema)
    df_new = spark.createDataFrame(rows(new), schema)
    got = {
        r["k"]: r["change_type"]
        for r in diff_tables(df_old, df_new, ["k"]).collect()
    }
    want = {}
    for k in set(old) | set(new):
        if k not in old:
            want[k] = "added"
        elif k not in new:
            want[k] = "removed"
        elif old[k] != new[k]:
            want[k] = "changed"
    assert got == want


bloom_keys = st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=40)
bloom_probes = st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=60)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(keyvals=bloom_keys, probevals=bloom_probes)
def test_bloom_semijoin_never_misses_and_counts_agree(spark, keyvals, probevals):
    """Bloom audit invariants on arbitrary key/probe sets (tiny 512-bit
    filter to force false positives): missed == 0 ALWAYS, exact_hits
    equals the true membership count, bloom_pass = exact + false_pos,
    and n_probe/n_keys match the inputs."""
    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        bloom_semijoin_stats,
    )

    keys = spark.createDataFrame([(k,) for k in set(keyvals)], "k bigint")
    probe = spark.createDataFrame([(p,) for p in probevals], "pk bigint")
    r = bloom_semijoin_stats(
        probe, "pk", keys, key_col="k", n_bits=512, k_hashes=3
    ).collect()[0]
    ks = set(keyvals)
    assert r["missed"] == 0
    assert r["n_probe"] == len(probevals) and r["n_keys"] == len(ks)
    assert r["exact_hits"] == sum(1 for p in probevals if p in ks)
    assert r["bloom_pass"] == r["exact_hits"] + r["false_pos"]


phrase_docs = st.lists(
    st.lists(st.sampled_from(["table", "hash", "x"]), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=phrase_docs)
def test_phrase_search_matches_bruteforce(spark, docs):
    """phrase_search over arbitrary token streams == brute-force adjacent
    bigram counting (including overlapping runs like 'table table hash')."""
    import os
    import tempfile

    from s3_to_redshift_with_airflow_spark.plans import query_map

    expected = {}
    for i, toks in enumerate(docs):
        n = sum(
            1
            for j in range(len(toks) - 1)
            if toks[j] == "table" and toks[j + 1] == "hash"
        )
        if n:
            first = min(
                j
                for j in range(len(toks) - 1)
                if toks[j] == "table" and toks[j + 1] == "hash"
            )
            expected[i] = (n, first)
    rows = [(i, " ".join(toks) if toks else "x", "en", "s0", 1) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["doc_id"]: (r["n_matches"], r["first_pos"])
            for r in query_map()["phrase_search"](spark, d).collect()
        }
    assert got == expected


cdc_ops = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),     # user key
        st.integers(min_value=0, max_value=15),    # ts hour
        st.sampled_from(["signup", "error", "click"]),  # I / D / U
        st.integers(min_value=0, max_value=50),    # value
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=cdc_ops)
def test_cdc_compact_matches_dict_model(spark, ops):
    """cdc_compact over arbitrary changelogs == replaying the log into a
    dict (insert/update set, delete del) in (ts, event_id) order."""
    import os
    import tempfile
    from datetime import datetime

    from s3_to_redshift_with_airflow_spark.plans import query_map

    rows = [
        (f"e{i:04d}", datetime(2024, 1, 1, h), k, op, float(v))
        for i, (k, h, op, v) in enumerate(ops)
    ]
    state: dict[int, float] = {}
    n_ops: dict[int, int] = {}
    for eid, ts, k, op, v in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        n_ops[k] = n_ops.get(k, 0) + 1
        if op == "error":
            state.pop(k, None)
        else:
            state[k] = v
    df = spark.createDataFrame(
        rows,
        "event_id string, ts timestamp, user_id bigint, event_type string, value double",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = {
            r["user_id"]: (r["state_value"], r["n_ops"])
            for r in query_map()["cdc_compact"](spark, d).collect()
        }
    assert got == {k: (v, n_ops[k]) for k, v in state.items()}


ent_texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=20), min_size=1, max_size=6
)


def _lg_fp(x: int, scale: int = 65536) -> int:
    m = x.bit_length() - 1
    p = 1 << m
    return m * scale + ((x - p) * scale) // p


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=ent_texts)
def test_char_entropy_matches_python_fixed_point(spark, texts):
    """char_entropy over arbitrary strings == the Python reference of the
    same fixed-point formula (normalize, count chars, N·H div N)."""
    import os
    import re
    import tempfile
    from collections import Counter

    from s3_to_redshift_with_airflow_spark.plans import query_map

    expected = {}
    for i, t in enumerate(texts):
        norm = re.sub(r"\s+", " ", t.lower().strip())
        if not norm:
            continue
        cnt = Counter(norm)
        n = sum(cnt.values())
        s = sum(c * (_lg_fp(n) - _lg_fp(c)) for c in cnt.values())
        expected[i] = (n, len(cnt), s // n)
    rows = [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["doc_id"]: (r["n_chars_used"], r["n_alphabet"], r["entropy_fp"])
            for r in query_map()["char_entropy_filter"](spark, d).collect()
        }
    assert got == expected


# --- cdc_to_scd2 dict model ---------------------------------------------------

scd2_dim0 = st.dictionaries(
    st.integers(min_value=0, max_value=5),
    st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
    max_size=4,
)
scd2_ops = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),          # key (some never in dim)
        st.sampled_from(["I", "U", "D"]),
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
    ),
    min_size=0,
    max_size=14,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(dim0=scd2_dim0, ops=scd2_ops)
def test_cdc_to_scd2_matches_dict_model(spark, dim0, ops):
    """cdc_to_scd2 over arbitrary op logs and initial dimensions == the
    dict model: per key the highest-seq op wins; D closes the open version
    (no successor; no-op for unknown keys), I/U upserts with NULL-safe
    change detection (None attrs both in the dim and in updates)."""
    from s3_to_redshift_with_airflow_spark.operators.relational import (
        cdc_to_scd2,
    )

    T0, EFF = "2024-01-01 00:00:00", "2024-06-01 00:00:00"
    winner = {}
    for seq, (k, op, v) in enumerate(ops):
        winner[k] = (op, float(v) if v is not None else None)
    expected = set()
    for k, v0 in dim0.items():
        v0f = float(v0) if v0 is not None else None
        w = winner.get(k)
        if w is None:
            expected.add((k, v0f, T0, None))
        elif w[0] == "D":
            expected.add((k, v0f, T0, EFF))
        elif not (w[1] == v0f or (w[1] is None and v0f is None)):
            expected.add((k, v0f, T0, EFF))
            expected.add((k, w[1], EFF, None))
        else:
            expected.add((k, v0f, T0, None))
    for k, w in winner.items():
        if k not in dim0 and w[0] != "D":
            expected.add((k, w[1], EFF, None))

    dim = spark.createDataFrame(
        [
            (k, float(v) if v is not None else None, T0, None)
            for k, v in dim0.items()
        ]
        or [(None, None, None, None)],
        "k long, v double, valid_from string, valid_to string",
    ).filter("k IS NOT NULL").select(
        "k",
        "v",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    ops_df = spark.createDataFrame(
        [
            (k, seq, op, float(v) if v is not None else None)
            for seq, (k, op, v) in enumerate(ops)
        ]
        or [(None, None, None, None)],
        "k long, seq long, op string, v double",
    ).filter("k IS NOT NULL")
    got = {
        (
            r["k"],
            r["v"],
            str(r["valid_from"]),
            str(r["valid_to"]) if r["valid_to"] is not None else None,
        )
        for r in cdc_to_scd2(
            ops_df, dim, keys=["k"], attrs=["v"], effective=EFF,
            order_cols=["seq"],
        ).collect()
    }
    assert got == expected


# --- BM25 fixed-point reference -----------------------------------------------

_BM25_VOCAB = ["vector", "merge", "window", "alpha", "beta"]
bm25_docs = st.lists(
    st.lists(st.sampled_from(_BM25_VOCAB), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


def _bm25_reference(docs: list[list[str]], terms, k1s=1200, bs=750, scale=10**6):
    """Pure-Python replay of the registry's exact fixed-point BM25."""
    n_docs = len(docs)
    # engine len: split('', ' ') == [''] -> an empty doc has length 1
    lens = {i: max(1, len(t)) for i, t in enumerate(docs)}
    avgl = sum(lens.values()) // n_docs
    scores: dict[int, tuple[int, int]] = {}
    df = {
        t: sum(1 for d in docs if t in d)
        for t in terms
    }
    for i, toks in enumerate(docs):
        s, n_terms = 0, 0
        for t in terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = _lg_fp(2 * n_docs + 2) - _lg_fp(2 * df[t] + 1)
            num = tf * (k1s + 1000) * 1000 * avgl
            den = tf * scale * avgl + k1s * (1000 - bs) * avgl + k1s * bs * lens[i]
            s += idf * ((num * scale) // den)
            n_terms += 1
        if n_terms:
            scores[i] = (s, n_terms)
    return scores


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=bm25_docs)
def test_bm25_matches_python_fixed_point(spark, docs):
    """bm25_search over arbitrary tiny corpora == the pure-Python replay of
    the same integer formula — scores, matched-term counts, and the
    (score desc, doc_id asc) top-k ordering, bit-for-bit."""
    import os
    import tempfile

    from s3_to_redshift_with_airflow_spark.plans import query_map
    from s3_to_redshift_with_airflow_spark.plans.extensions import (
        _SEARCH_TERMS,
    )

    rows = [
        (i, " ".join(toks), "en", "s0", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    ref = _bm25_reference(docs, _SEARCH_TERMS)
    want = sorted(
        ((s, i, n) for i, (s, n) in ref.items()),
        key=lambda r: (-r[0], r[1]),
    )[:20]
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = [
            (r["score"], r["doc_id"], r["n_terms"])
            for r in query_map()["bm25_search"](spark, d)
            .orderBy("rnk")
            .collect()
        ]
    assert got == want


# --- value-histogram quantile sketch dict model --------------------------------

hist_vals = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),                     # grain
        st.integers(min_value=0, max_value=4),           # day offset
        st.floats(
            min_value=0.0, max_value=100.0,
            allow_nan=False, allow_infinity=False,
        ),
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=hist_vals)
def test_histogram_quantiles_match_dict_model(spark, rows):
    """value_histogram + histogram_quantiles over arbitrary inputs == the
    pure-Python model: bucket = floor(v/width), quantile = upper boundary
    of the smallest bucket whose cumulative count covers ceil(q·n/100) —
    merged across days, per grain, bit-for-bit."""
    import math
    from datetime import datetime

    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        histogram_quantiles,
        value_histogram,
    )

    width, qs = 8.0, [50, 95, 99]
    df = spark.createDataFrame(
        [(g, datetime(2024, 1, 1 + d, 12), float(v)) for g, d, v in rows],
        "g string, ts timestamp, value double",
    )
    got = {
        (r["g"], r["q_pct"]): (r["n_total"], r["est_value"])
        for r in histogram_quantiles(
            value_histogram(df, grain_cols=["g"], width=width),
            grain_cols=["g"],
            q_pcts=qs,
            width=width,
        ).collect()
    }
    expected = {}
    by_g: dict[str, list[int]] = {}
    for g, _d, v in rows:
        by_g.setdefault(g, []).append(math.floor(v / width))
    for g, buckets in by_g.items():
        buckets.sort()
        n = len(buckets)
        for q in qs:
            covering = buckets[math.ceil(q * n / 100) - 1]
            expected[(g, q)] = (n, float(covering + 1) * width)
    assert got == expected


# --- KMV sketch + set ops vs pure-Python replay --------------------------------

_kmv_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(min_value=0, max_value=40)),
    min_size=1,
    max_size=30,
)


def _kmv_hash40(key: str) -> int:
    import hashlib

    return int(hashlib.md5(f"kmv:{key}".encode()).hexdigest()[:10], 16)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=_kmv_rows, k=st.integers(min_value=2, max_value=8))
def test_kmv_pair_ops_matches_python_replay(spark, rows, k):
    """KMV sketch build + pair set-ops on adversarially small inputs
    (duplicate keys, kp<k boundaries, single-group cases) must equal a
    pure-Python replay of the bottom-k + integer-estimator definition."""
    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        kmv_pair_ops,
        kmv_sketch_table,
    )

    df = spark.createDataFrame(rows, "g string, key bigint")
    sk = kmv_sketch_table(df, "key", "g", k=k)
    got = {
        (r.type_a, r.type_b): (
            r.kp,
            r.union_est,
            r.intersect_est,
            r.jaccard_ppm,
        )
        for r in kmv_pair_ops(sk, k=k).collect()
    }

    hs = {}
    for g, key in rows:
        hs.setdefault(g, set()).add(_kmv_hash40(str(key)))
    bot = {g: sorted(s)[:k] for g, s in hs.items()}
    want = {}
    dom = 1 << 40
    gs = sorted(bot)
    for i, ga in enumerate(gs):
        for gb in gs[i + 1 :]:
            merged = sorted(set(bot[ga]) | set(bot[gb]))[:k]
            kp = len(merged)
            n_both = sum(
                1 for h in merged if h in hs[ga] and h in hs[gb]
            )
            if kp < k:
                union_est, inter_est = kp, n_both
            else:
                union_est = (k - 1) * dom // merged[-1]
                inter_est = n_both * union_est // kp
            want[(ga, gb)] = (kp, union_est, inter_est, n_both * 10**6 // kp)
    assert got == want


# --- Misra-Gries offset form vs pure-Python replay ------------------------------

_mg_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),  # part
        st.integers(min_value=0, max_value=9),  # key
    ),
    min_size=1,
    max_size=40,
)


def _py_mg(counts: dict, k: int) -> dict:
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    t = ranked[k][1] if len(ranked) > k else 0
    return {key: c - t for key, c in counts.items() if c > t}


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=_mg_rows, k=st.integers(min_value=1, max_value=5))
def test_mg_summary_and_merge_match_python_replay(spark, rows, k):
    """mg_summary per part and the k-way mg_merge must equal the pure
    offset-form definition on adversarial tiny inputs (all-tied counts,
    singleton parts, k larger than the key space)."""
    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        mg_merge,
        mg_summary,
    )

    df = spark.createDataFrame(rows, "part bigint, key bigint")
    daily = mg_summary(df, "key", k=k, grain_cols=["part"])
    got_parts = {}
    for r in daily.collect():
        got_parts.setdefault(r.part, {})[r.key] = r.counter
    want_parts = {}
    for part, key in rows:
        want_parts.setdefault(part, {}).setdefault(key, 0)
        want_parts[part][key] += 1
    want_parts = {p: _py_mg(c, k) for p, c in want_parts.items()}
    want_parts = {p: c for p, c in want_parts.items() if c}
    assert got_parts == want_parts

    got_merge = {r.key: r.counter for r in mg_merge(daily, k=k, grain_cols=["part"]).collect()}
    summed = {}
    for c in want_parts.values():
        for key, v in c.items():
            summed[key] = summed.get(key, 0) + v
    assert got_merge == (_py_mg(summed, k) if summed else {})


# --- interval coalescing vs brute-force merge -----------------------------------

_iv_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),   # key
        st.integers(min_value=0, max_value=30),  # start
        st.integers(min_value=0, max_value=15),  # length
    ),
    min_size=1,
    max_size=15,
)


def _py_coalesce(ivs):
    """Brute force: sort per key, sweep, merge overlap-or-touch."""
    out = {}
    by_key = {}
    for k, s, ln in ivs:
        by_key.setdefault(k, []).append((s, s + ln))
    for k, pairs in by_key.items():
        islands = []
        for s, e in sorted(pairs):
            if islands and s <= islands[-1][1]:
                ps, pe, n = islands[-1]
                islands[-1] = (ps, max(pe, e), n + 1)
            else:
                islands.append((s, e, 1))
        out[k] = islands
    return {
        (k, s): (e, n) for k, isl in out.items() for s, e, n in isl
    }


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ivs=_iv_rows)
def test_interval_coalesce_matches_bruteforce(spark, ivs):
    """interval_coalesce on randomized overlapping/touching/contained/
    duplicate intervals equals the sweep-line reference."""
    from s3_to_redshift_with_airflow_spark.operators.timeseries import (
        interval_coalesce,
    )

    df = spark.createDataFrame(
        [(k, s, s + ln) for k, s, ln in ivs], "k bigint, s bigint, e bigint"
    )
    got = {
        (r.k, r.island_start): (r.island_end, r.n_merged)
        for r in interval_coalesce(df, ["k"], "s", "e").collect()
    }
    assert got == _py_coalesce(ivs)


# --- streaming histogram store: random epoch partitionings + replays -----------

_hist_vals = st.lists(
    st.integers(min_value=-40, max_value=40), min_size=1, max_size=24
)
# how the rows split into epochs, and which deliveries repeat/arrive stale:
# a delivery schedule like [0, 0, 1, 0, 2, 2] models at-least-once
# foreachBatch (consecutive replays AND a stale re-delivery after later
# epochs committed) — the ledger must make all of them no-ops.
_hist_cuts = st.lists(st.integers(min_value=0, max_value=23), max_size=2)
_hist_replays = st.lists(st.integers(min_value=0, max_value=2), max_size=3)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(vals=_hist_vals, cuts=_hist_cuts, replays=_hist_replays)
def test_histogram_store_replays_equal_batch_build(spark, vals, cuts, replays):
    """The value-histogram foreachBatch store under a RANDOM epoch
    partitioning with REPLAYED deliveries interleaved must be
    bit-identical to a batch value_histogram over all rows — the claimed
    strongest contract of the four stored-artifact consumers, now pinned
    under the at-least-once failure model (VERDICT r6 'What's wrong' #1 /
    next-round #7)."""
    import tempfile

    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        value_histogram,
    )
    from s3_to_redshift_with_airflow_spark.streaming.pipeline import (
        foreach_batch_histogram_maintain,
    )

    # split vals into up to 3 ordered epochs at the cut points
    bounds = sorted({min(c, len(vals)) for c in cuts})
    parts, prev = [], 0
    for b in bounds + [len(vals)]:
        parts.append(vals[prev:b])
        prev = b
    parts = [p for p in parts if p] or [vals]

    def df_of(part):
        return spark.createDataFrame(
            [(float(v),) for v in part], "value double"
        ).select(F.lit("2024-01-01").cast("timestamp").alias("ts"), "value")

    target = tempfile.mkdtemp(prefix="hist_prop_") + "/hist"
    spark.createDataFrame([], "day date, bucket bigint, n bigint").write.parquet(
        target
    )
    sink = foreach_batch_histogram_maintain(target, width=8.0)
    # in-order originals with replayed deliveries woven in
    schedule = []
    for e in range(len(parts)):
        schedule.append(e)
        schedule.extend(r for r in replays if r <= e)
    for e in schedule:
        if e < len(parts):
            sink(df_of(parts[e]), e)

    got = sorted(
        tuple(r) for r in spark.read.parquet(target).collect()
    )
    want = sorted(
        tuple(r)
        for r in value_histogram(df_of(vals), "value", None, "ts", 8.0).collect()
    )
    assert got == want


# --- r9: z-set retraction maintenance == recompute under ANY batching ----

_wkeys = st.sampled_from(["a", "b", "c"])
_wvals = st.integers(min_value=-4, max_value=4)
# a changelog: inserts interleaved with retractions OF EARLIER INSERTS
_winserts = st.lists(st.tuples(_wkeys, _wvals), min_size=0, max_size=14)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    inserts=_winserts,
    retract_mask=st.lists(st.booleans(), min_size=14, max_size=14),
    split=st.integers(min_value=0, max_value=14),
)
def test_weighted_delta_maintain_equals_recompute(spark, inserts, retract_mask, split):
    """apply_weighted_delta == recompute over the surviving multiset for
    ANY insert set, ANY retraction subset of it, and ANY batching point:
    rows are inserted (w=+1), a mask retracts some of them (w=-1), the
    changelog is split into state-then-delta at an arbitrary point, and
    the maintained view must equal the brute-force aggregate of what
    survives — including groups that vanish entirely."""
    from s3_to_redshift_with_airflow_spark.operators.relational import (
        apply_weighted_delta,
    )

    survivors = [
        kv for i, kv in enumerate(inserts) if not retract_mask[i]
    ]
    changelog = [(k, float(v), 1) for k, v in inserts] + [
        (k, float(v), -1)
        for i, (k, v) in enumerate(inserts)
        if retract_mask[i]
    ]
    head, tail = changelog[:split], changelog[split:]
    schema = "k string, value double, w int"
    state = (
        spark.createDataFrame(head, schema)
        .groupBy("k")
        .agg(
            F.sum("w").cast("bigint").alias("cnt"),
            F.sum(F.col("w") * F.col("value").cast("decimal(27,6)"))
            .cast("decimal(38,6)")
            .alias("sm"),
        )
        .filter(F.col("cnt") != 0)
    )
    out = apply_weighted_delta(
        state, spark.createDataFrame(tail, schema), ["k"], "value"
    )
    got = {r["k"]: (r["cnt"], float(r["sm"])) for r in out.collect()}
    want: dict = {}
    for k, v in survivors:
        c, s = want.get(k, (0, 0.0))
        want[k] = (c + 1, s + float(v))
    assert got == want


# --- r9: segment store — any epoch split x any compaction schedule ------


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    cuts=st.lists(
        st.integers(min_value=1, max_value=29), min_size=0, max_size=3, unique=True
    ),
    compact_after=st.lists(st.booleans(), min_size=4, max_size=4),
    tiered=st.booleans(),
)
def test_segmented_bm25_any_schedule_equals_rebuild(
    spark, tmp_path_factory, cuts, compact_after, tiered
):
    """The segment store's global invariant under hypothesis: for ANY
    partition of the corpus into a seed + epochs, with compaction (all-
    merge or tiered) fired after ANY subset of epochs, the served index
    is bit-identical to a monolithic rebuild over everything indexed."""
    from s3_to_redshift_with_airflow_spark.operators.retrieval import (
        bm25_index_build,
    )
    from s3_to_redshift_with_airflow_spark.streaming.pipeline import (
        compact_bm25_segments,
        foreach_batch_bm25_maintain_segmented,
        read_bm25_index_segmented,
        seed_bm25_index_segmented,
    )

    docs = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok "), (F.col("id") % 7).cast("string")).alias("text"),
    )
    bounds = [0, *sorted(cuts), 30]
    idx = str(tmp_path_factory.mktemp("seg") / "index")
    seed_bm25_index_segmented(docs(bounds[0], bounds[1]), idx)
    sink = foreach_batch_bm25_maintain_segmented(idx)
    for e in range(1, len(bounds) - 1):
        sink(docs(bounds[e], bounds[e + 1]), e)
        if compact_after[e % len(compact_after)]:
            compact_bm25_segments(spark, idx, tiered=tiered)
    if compact_after[0]:
        compact_bm25_segments(spark, idx, tiered=tiered)
    p, l, s = read_bm25_index_segmented(spark, idx)
    bp, bl, bs = bm25_index_build(docs(0, 30))
    assert sorted(map(tuple, p.collect())) == sorted(map(tuple, bp.collect()))
    assert sorted(map(tuple, l.collect())) == sorted(map(tuple, bl.collect()))
    assert [tuple(r) for r in s.collect()] == [tuple(r) for r in bs.collect()]


# --- r10: delta-join maintain == recompute for ANY two-sided changelog ----


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    a_rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-3, 3)), min_size=0, max_size=10
    ),
    a_retract=st.lists(st.booleans(), min_size=10, max_size=10),
    a_insert=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-3, 3)), min_size=0, max_size=4
    ),
    b_keys=st.lists(st.integers(0, 5), min_size=0, max_size=6, unique=True),
    b_retract=st.lists(st.booleans(), min_size=6, max_size=6),
    b_insert=st.lists(st.integers(0, 5), min_size=0, max_size=3, unique=True),
)
def test_weighted_join_delta_equals_recompute_any_changelog(
    spark, a_rows, a_retract, a_insert, b_keys, b_retract, b_insert
):
    """The bilinear rule under hypothesis: for ANY standing relations and
    ANY two-sided weighted changelogs (fact inserts/deletes, dimension
    inserts/deletes), state + apply_weighted_delta(weighted_join_delta)
    == the brute-force aggregate over (A+ΔA) ⋈ (B+ΔB)."""
    from s3_to_redshift_with_airflow_spark.operators.relational import (
        apply_weighted_delta,
        weighted_join_delta,
    )

    b_insert = [k for k in b_insert if k not in b_keys]  # keys, not multiset
    a_fin = [kv for i, kv in enumerate(a_rows) if not a_retract[i]] + a_insert
    b_fin = [k for i, k in enumerate(b_keys) if not b_retract[i]] + b_insert
    want: dict = {}
    for k, v in a_fin:
        if k in b_fin:
            c, s = want.get(f"attr{k}", (0, 0.0))
            want[f"attr{k}"] = (c + 1, s + float(v))

    schema_a = "k long, v double"
    a_old = spark.createDataFrame(
        [(k, float(v)) for k, v in a_rows] or [(99, 0.0)], schema_a
    )
    if not a_rows:
        a_old = a_old.filter(F.col("k") < 0)  # truly empty, schema kept
    da_rows = [(k, float(v), 1) for k, v in a_insert] + [
        (k, float(v), -1) for i, (k, v) in enumerate(a_rows) if a_retract[i]
    ]
    da = spark.createDataFrame(da_rows or [(99, 0.0, 0)], "k long, v double, w int")
    if not da_rows:
        da = da.filter(F.col("k") < 0)
    b_old_rows = [(k, f"attr{k}") for k in b_keys]
    b_old = spark.createDataFrame(b_old_rows or [(99, "x")], "bk long, attr string")
    if not b_old_rows:
        b_old = b_old.filter(F.col("bk") < 0)
    db_rows = [(k, f"attr{k}", 1) for k in b_insert] + [
        (k, f"attr{k}", -1) for i, k in enumerate(b_keys) if b_retract[i]
    ]
    db = spark.createDataFrame(
        db_rows or [(99, "x", 0)], "bk long, attr string, w int"
    )
    if not db_rows:
        db = db.filter(F.col("bk") < 0)

    state = (
        a_old.join(b_old, a_old["k"] == b_old["bk"])
        .groupBy("attr")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(F.col("v").cast("decimal(27,6)"))
            .cast("decimal(38,6)")
            .alias("sm"),
        )
    )
    dv = weighted_join_delta(a_old, da, b_old, db, "k", "bk")
    out = apply_weighted_delta(state, dv, ["attr"], "v")
    got = {r["attr"]: (r["cnt"], float(r["sm"])) for r in out.collect()}
    assert got == want
