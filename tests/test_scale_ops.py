"""Scale-path ops: IVF recall, approx-aggregate error envelope, multimodal
feature determinism, streaming/batch window equivalence."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from s3_to_redshift_with_airflow_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)
from s3_to_redshift_with_airflow_spark.plans import query_map

from .conftest import SF_SMOKE


def test_ivf_topk_recall_vs_exact(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, k=10)
    approx = ivf_topk(emb, queries, k=10, n_clusters=8, n_probe=5)
    truth = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    got = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    # measured 0.98 at these parameters on the driver testdata; 0.9 catches
    # any quantizer/probe regression while leaving data-regen margin
    assert recall >= 0.9, f"IVF recall {recall:.2f} too low"
    # per-query result size is capped at k
    per_q = approx.groupBy("query_id").count().collect()
    assert all(r["count"] <= 10 for r in per_q)


def test_ivf_scores_are_exact_cosines(spark):
    """IVF re-ranks with exact cosine: any (query, vec) it returns must carry
    the same score the brute-force path computes."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["vec_id"]): r["cos_sim"]
        for r in brute_force_topk(emb, queries, k=1000).collect()
    }
    for r in ivf_topk(emb, queries, k=5, n_clusters=8, n_probe=2).collect():
        key = (r["query_id"], r["vec_id"])
        if key in exact:
            assert r["cos_sim"] == pytest.approx(exact[key], abs=1e-12)


def test_approx_agg_error_envelope(spark):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    out = {r["event_type"]: r for r in query_map()["approx_agg"](spark, SF_SMOKE).collect()}
    exact = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert set(out) == set(exact)
    for et, row in out.items():
        users, p50 = exact[et]["users"], exact[et]["p50"]
        assert abs(row["approx_users"] - users) <= max(3, 0.05 * users)
        assert row["p50_value"] == pytest.approx(p50, rel=0.05)


def test_multimodal_features_match_hashlib(spark):
    out = query_map()["multimodal_features"](spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    sample = {r["doc_id"]: r["text"] for r in docs.limit(5).collect()}
    got = {r["media_id"]: r for r in out.filter(F.col("media_id").isin(list(sample))).collect()}
    for doc_id, text in sample.items():
        payload = text.encode("utf-8")
        r = got[doc_id]
        assert r["digest"] == hashlib.md5(payload).hexdigest()
        assert r["n_bytes"] == len(payload)
        assert r["fake_width"] == len(payload) % 64 + 1
        assert r["fake_height"] == len(payload) % 48 + 1


def test_video_frame_sample_counts(spark):
    out = query_map()["video_frame_sample"](spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n_chars = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    counts = {r["media_id"]: r["count"] for r in out.groupBy("media_id").count().collect()}
    assert set(counts) == set(n_chars)
    for mid, cnt in counts.items():
        assert cnt == min(n_chars[mid] * 10 // 1000 + 1, 16)
    # offsets are 1s-spaced from zero
    bad = out.filter(F.col("offset_ms") != F.col("frame_index") * 1000).count()
    assert bad == 0


def test_streaming_window_agg_equals_batch(spark):
    from s3_to_redshift_with_airflow_spark.sources.readers import load_tables

    streamed = {
        r["window_start"]: (r["n_events"], r["total_value"])
        for r in query_map()["streaming_window_agg"](spark, SF_SMOKE).collect()
    }
    (events,) = load_tables(spark, SF_SMOKE, "events")
    batch = {
        r["window_start"]: (r["n_events"], r["total_value"])
        for r in events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("total_value"),
        )
        .collect()
    }
    assert streamed == batch


def test_asof_join_semantics(spark):
    from s3_to_redshift_with_airflow_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 25), (3, 1, 30), (4, 2, 10), (5, 3, 50)],
        "event_id bigint, k bigint, t bigint",
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 25, None), (1, 28, 300.0), (2, 11, 400.0)],
        "k bigint, t bigint, v double",
    )
    out = {
        r["event_id"]: (r["asof_t"], r["asof_v"])
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="t"
        ).collect()
    }
    assert out[1] == (5, 100.0)      # strictly-before match
    assert out[2] == (25, None)      # inclusive at-or-before; NULL payload
    #                                  carried atomically (no row tearing
    #                                  back to t=5's 100.0)
    assert out[3] == (28, 300.0)
    assert out[4] == (None, None)    # right row is later -> no match
    assert out[5] == (None, None)    # key absent from right


def test_connected_components_planted_graph(spark):
    from s3_to_redshift_with_airflow_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        # component {1,2,3} (triangle), {4,5}, chain {6,7,8,9} (diameter 3),
        # and a cycle {10,11,12}
        [(2, 1), (2, 3), (4, 5), (6, 7), (7, 8), (8, 9), (10, 11), (11, 12), (12, 10)],
        "id_a bigint, id_b bigint",
    )
    out = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert out == {
        1: 1, 2: 1, 3: 1,
        4: 4, 5: 4,
        6: 6, 7: 6, 8: 6, 9: 6,
        10: 10, 11: 10, 12: 10,
    }


def test_range_join_semantics(spark):
    from s3_to_redshift_with_airflow_spark.operators.timeseries import range_join

    points = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 11:00:00"),
         (3, "2024-01-01 12:30:00"), (4, "2024-01-02 00:00:00")],
        "pid bigint, t string",
    ).select("pid", F.col("t").cast("timestamp").alias("t"))
    intervals = spark.createDataFrame(
        [(100, "2024-01-01 09:00:00", "2024-01-01 10:00:00"),   # boundary hit
         (200, "2024-01-01 10:30:00", "2024-01-01 13:00:00"),   # spans buckets
         (300, "2024-01-01 12:00:00", "2024-01-01 23:00:00")],  # overlaps 200
        "iid bigint, s string, e string",
    ).select(
        "iid",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, point_col="t", start_col="s", end_col="e",
            bucket_seconds=3600,
        ).collect()
    }
    assert got == {
        (1, 100),          # inclusive end boundary
        (2, 200),
        (3, 200), (3, 300),  # overlapping intervals both match
        # pid 4 matches nothing
    }


def test_incremental_agg_merge_any_cutoff(spark):
    """merge(state(A), state(B)) == state(A ∪ B) must hold wherever the
    batch boundary falls — empty slices included."""
    from s3_to_redshift_with_airflow_spark.sources.readers import (
        table_path,
        with_ts_from_nanos,
    )

    events = with_ts_from_nanos(
        spark.read.parquet(table_path("/root/testdata/sf0.001", "events")), "ts"
    )
    dec_val = F.col("value").cast("decimal(27,6)")

    def partial(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum(dec_val).alias("sm")
        )

    full = {
        r["event_type"]: (r["cnt"], r["sm"]) for r in partial(events).collect()
    }
    for cutoff in ["1990-01-01", "2024-03-15 07:00:00", "2099-01-01"]:
        merged = (
            partial(events.filter(F.col("ts") < F.lit(cutoff)))
            .unionByName(partial(events.filter(F.col("ts") >= F.lit(cutoff))))
            .groupBy("event_type")
            .agg(F.sum("cnt").alias("cnt"), F.sum("sm").alias("sm"))
        )
        got = {r["event_type"]: (r["cnt"], r["sm"]) for r in merged.collect()}
        assert got == full, cutoff


@pytest.mark.slow
def test_ann_recall_report_pins_all_methods(spark):
    """The registry-visible recall report must show ≥0.9 top-10 recall for
    the float ANN paths at their registered parameters; the deterministic
    int8 IVF probes far more aggressively (4/32 lists = 12.5% of the
    corpus vs MLlib IVF's 5/8 = 62.5%), so its floor is the probe
    fraction's measured 0.6 — and being deterministic, its recall is a
    constant of the corpus, not a distribution."""
    rows = query_map()["ann_recall_report"](spark, SF_SMOKE).collect()
    assert [r["method"] for r in rows] == [
        "ivf_ann_topk",
        "ivf_int8_ann_topk",
        "ivf_pq_ann_topk",
        "lsh_ann_topk",
        "lsh_multiprobe_ann_topk",
    ]
    floors = {
        "ivf_ann_topk": 0.9,
        "ivf_int8_ann_topk": 0.6,
        # IVFADC + exact refine at the registered (12/32 probes, m=16,
        # R=100) — measured 0.96; deterministic, so a corpus constant
        "ivf_pq_ann_topk": 0.9,
        "lsh_ann_topk": 0.9,
        "lsh_multiprobe_ann_topk": 0.9,
    }
    recall = {}
    for r in rows:
        assert r["n_exact"] == 50  # 5 queries × top-10 exact
        assert r["recall_at_10"] >= floors[r["method"]], (
            f"{r['method']} recall {r['recall_at_10']}"
        )
        recall[r["method"]] = r["recall_at_10"]
    # multi-probe supersets the single-probe candidate set → recall can
    # only rise (exact cosine re-rank of a superset)
    assert recall["lsh_multiprobe_ann_topk"] >= recall["lsh_ann_topk"]


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """reliable=True (checkpoint() to a real checkpoint dir) must converge to
    the identical fixpoint as localCheckpoint mode on a graph that needs ≥2
    label-propagation iterations (the 1-2-3 chain has diameter 2)."""
    from s3_to_redshift_with_airflow_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], "id_a long, id_b long"
    )
    expected = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    out = connected_components(
        edges, reliable=True, checkpoint_dir=str(tmp_path / "ckpt")
    )
    assert {r["node"]: r["component"] for r in out.collect()} == expected
    # superseded iteration checkpoints are cleaned: at most ONE rdd-* dir
    # (the final labels) remains under the context-private checkpoint dir,
    # and the result stays readable from it after cleanup
    import glob

    remaining = glob.glob(str(tmp_path / "ckpt" / "*" / "rdd-*"))
    assert len(remaining) <= 1, remaining
    assert {r["node"]: r["component"] for r in out.collect()} == expected
    # both modes produce the identical fixpoint
    local = connected_components(edges)
    assert {r["node"]: r["component"] for r in local.collect()} == expected


def test_connected_components_shared_checkpoint_dir(spark, tmp_path):
    """Ownership-tracked cleanup: two sequential reliable calls sharing ONE
    pre-set checkpoint dir must not delete each other's snapshots. The first
    call's returned labels stay readable after the second call (its backing
    checkpoint must survive), the second call converges (its edge-table
    checkpoint is not mistaken for a superseded snapshot), and cleanup still
    happens (at most one remaining rdd-* per call)."""
    from s3_to_redshift_with_airflow_spark.operators.graph import (
        connected_components,
    )

    spark.sparkContext.setCheckpointDir(str(tmp_path / "shared_ckpt"))
    edges1 = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    edges2 = spark.createDataFrame(
        [(7, 8), (8, 9), (9, 12)], "id_a long, id_b long"
    )
    out1 = connected_components(edges1, reliable=True)
    out2 = connected_components(edges2, reliable=True)
    # out1's backing checkpoint must have survived call 2's cleanup
    assert {r["node"]: r["component"] for r in out1.collect()} == {
        1: 1, 2: 1, 3: 1
    }
    assert {r["node"]: r["component"] for r in out2.collect()} == {
        7: 7, 8: 7, 9: 7, 12: 7
    }
    import glob

    remaining = glob.glob(str(tmp_path / "shared_ckpt" / "*" / "rdd-*"))
    assert len(remaining) <= 2, remaining


def test_sketch_rollup_merge_associativity_and_error(spark):
    """The HLL estimate is deterministic and merge-associative: the
    union of per-day sketches must estimate EXACTLY what one direct
    sketch over the same rows estimates (same hashed value set), and
    both must land within HLL error of the exact distinct count."""
    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    rolled = {
        r["event_type"]: r["est_users"]
        for r in REGISTRY["sketch_rollup"].fn(spark, SF_SMOKE).collect()
    }
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    direct = {
        r["event_type"]: r["est"]
        for r in events.groupBy("event_type")
        .agg(
            F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))")
            .cast("bigint")
            .alias("est")
        )
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert rolled == direct  # merge-of-days == direct sketch, exactly
    for et, n in exact.items():
        assert abs(rolled[et] - n) <= max(2, 0.05 * n), (et, rolled[et], n)


def test_sketch_table_survives_raw_data_deletion(spark, tmp_path):
    """Persist-and-merge end-to-end: write the per-day sketch table to
    parquet, DELETE the raw events, and the rollup built by READING the
    sketch table is bit-identical to the live two-stage composition —
    proving coarser grains never re-scan raw data (VERDICT r4 #6)."""
    import shutil

    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        daily_user_sketches,
        rollup_user_sketches,
    )
    from s3_to_redshift_with_airflow_spark.sources.readers import (
        with_ts_from_nanos,
    )

    raw = str(tmp_path / "events_raw")
    spark.read.parquet(f"{SF_SMOKE}/events.parquet").write.parquet(raw)
    events = with_ts_from_nanos(spark.read.parquet(raw), "ts")
    want = [tuple(r) for r in rollup_user_sketches(
        daily_user_sketches(events)).collect()]

    sk_path = str(tmp_path / "sketch_table")
    daily_user_sketches(events).write.parquet(sk_path)
    shutil.rmtree(raw)  # the raw data is gone

    got = [tuple(r) for r in rollup_user_sketches(
        spark.read.parquet(sk_path)).collect()]
    assert got == want
    # and a COARSER grain (all types together) also needs only the sketches
    total = (
        spark.read.parquet(sk_path)
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").cast("bigint"))
        .collect()[0][0]
    )
    n_users = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "user_id").distinct().count()
    assert abs(total - n_users) <= max(2, 0.05 * n_users)


def test_cms_estimates_are_one_sided_and_tight_at_low_load(spark):
    """Count-min guarantees est >= exact always; at sf0.001's load factor
    (distinct users << d*w) collisions are rare, so the top keys'
    estimates should also be close (within 2x)."""
    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    rows = REGISTRY["cms_point_queries"].fn(spark, SF_SMOKE).collect()
    assert 1 <= len(rows) <= 20  # sf0.001 has fewer than 20 distinct users
    for r in rows:
        assert r["cms_est"] >= r["exact_n"], r
        assert r["cms_est"] <= 2 * r["exact_n"], r


def test_range_frame_handles_missing_buckets_where_rows_frame_cannot(spark):
    """The moving_range_frame contract demonstrated concretely: with hour
    3 missing, the 4h RANGE frame at hour 4 covers hours {1..4}-observed
    = {1,2,4}, while a 4-ROWS frame would wrongly reach back to hour 0."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [("a", dt.datetime(2024, 1, 1, h), n)
            for h, n in [(0, 1), (1, 2), (2, 4), (4, 8)]]  # hour 3 missing
    h = spark.createDataFrame(rows, "event_type string, hour_ts timestamp, n_events long")
    range_w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp("hour_ts"))
        .rangeBetween(-3 * 3600, 0)
    )
    rows_w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-3, 0)
    )
    got = {
        r["hour_ts"].hour: (r["rng"], r["rws"])
        for r in h.select(
            "hour_ts",
            F.sum("n_events").over(range_w).alias("rng"),
            F.sum("n_events").over(rows_w).alias("rws"),
        ).collect()
    }
    assert got[4] == (2 + 4 + 8, 1 + 2 + 4 + 8)  # RANGE excludes hour 0; ROWS wrongly includes it
    assert got[2] == (1 + 2 + 4, 1 + 2 + 4)      # no gap yet: frames agree


def test_cusum_localizes_an_injected_rate_shift(spark):
    """A series that runs at 2/hour for 24h then jumps to 10/hour for 24h:
    the scaled CUSUM statistic |n*cum - t*total| peaks exactly at the last
    pre-shift bucket (t=24), and a flat series scores 0 everywhere (argmax
    ties broken to the FIRST bucket)."""
    import datetime as dt

    from s3_to_redshift_with_airflow_spark.plans import REGISTRY
    from s3_to_redshift_with_airflow_spark.plans.scale_ops import q_cusum_changepoint

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(48):
        rate = 2 if h < 24 else 10
        for i in range(rate):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=i), "shift", 0.0, None))
            eid += 1
    for h in range(48):  # flat control series: 3/hour throughout
        for i in range(3):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=i), "flat", 0.0, None))
            eid += 1
    df = spark.createDataFrame(
        [(e, t, None, ty, v, p) for (e, t, ty, v, p) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {
            r["event_type"]: (r["cp_index"], r["s_abs"])
            for r in q_cusum_changepoint(spark, d).collect()
        }
    # shift series: peak deviation at the boundary bucket t=24:
    # cum_24 = 48, total = 288, n = 48 -> |48*48 - 24*288| = 4608
    assert out["shift"] == (24, 4608)
    # flat series: statistic is identically 0; earliest bucket wins the tie
    assert out["flat"] == (1, 0)
    assert "cusum_changepoint" in REGISTRY


def test_linear_trend_exact_rational_slope(spark):
    """Counts rising exactly 2/hour give slope_milli == 2000 with the
    rational reducing to 2; a non-divisible NEGATIVE slope is truncated on
    |num| then re-signed (the signed floor-div portability rule), and a
    1-bucket series yields NULL, not a divide-by-zero."""
    import datetime as dt
    import tempfile

    from s3_to_redshift_with_airflow_spark.plans import REGISTRY
    from s3_to_redshift_with_airflow_spark.plans.scale_ops import q_linear_trend

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def emit(h, n, ty):
        nonlocal eid
        for i in range(n):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=i), ty))
            eid += 1

    for t in range(1, 11):          # up: y = 3 + 2t, slope exactly 2
        emit(t, 3 + 2 * t, "up")
    for t, y in enumerate([5, 4, 4, 3], start=1):  # down: slope -7/10
        emit(t, y, "down")
    emit(1, 4, "single")            # one bucket: slope undefined
    df = spark.createDataFrame(
        [(e, t, None, ty, 0.0, None) for (e, t, ty) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r["event_type"]: r.asDict() for r in q_linear_trend(spark, d).collect()}
    up = out["up"]
    assert up["slope_num"] / up["slope_den"] == 2.0
    assert up["slope_milli"] == 2000
    down = out["down"]
    # n=4, sx=10, sxx=30, sy=16, sxy=37 -> num = 4*37-160 = -12, den = 20
    assert (down["slope_num"], down["slope_den"]) == (-12, 20)
    assert down["slope_milli"] == -(12 * 1000 // 20)  # -600 == trunc(-0.6)*1000
    single = out["single"]
    assert single["slope_den"] == 0 and single["slope_milli"] is None
    assert out["up"]["mean_milli"] == (sum(3 + 2 * t for t in range(1, 11)) * 1000) // 10
    assert "linear_trend" in REGISTRY


def test_k_anonymity_generalization_ladder(spark):
    """Each document reports the MINIMAL generalization level reaching k=5:
    a 6-strong full-QI class is level 0; singleton buckets under a 4-strong
    (lang, source) class escalate past level 1 to the 10-strong lang class
    (level 2); a lone lang suppresses (level 3); NULL lang is a real class
    via the sentinel, not a subtotal artifact."""
    import tempfile

    from s3_to_redshift_with_airflow_spark.plans import REGISTRY
    from s3_to_redshift_with_airflow_spark.plans.scale_ops import _KA_BUCKET, q_k_anonymity

    rows = []
    did = 0

    def emit(n, lang, source, bucket):
        nonlocal did
        for _ in range(n):
            rows.append((did, "t", lang, source, bucket * _KA_BUCKET + 7))
            did += 1

    emit(6, "en", "x", 1)            # ids 0-5: level 0
    for b in range(4):               # ids 6-9: level 2 (en class = 10 >= 5)
        emit(1, "en", "y", 10 + b)
    emit(1, "de", "z", 2)            # id 10: level 3 (suppress)
    emit(5, None, "w", 3)            # ids 11-15: level 0 under the sentinel
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r.asDict() for r in q_k_anonymity(spark, d).collect()}
    assert len(out) == 16
    assert all(out[i]["anon_level"] == 0 and out[i]["n0"] == 6 for i in range(6))
    assert all(out[i]["anon_level"] == 2 and out[i]["n0"] == 1 for i in range(6, 10))
    assert out[10]["anon_level"] == 3
    assert all(out[i]["anon_level"] == 0 for i in range(11, 16))
    assert "k_anonymity" in REGISTRY


def test_bloom_prefilter_no_false_negatives_and_bounded_fp(spark):
    """Bloom-filter invariants on the real tables: every true member
    passes (missed == 0 — the guarantee the prefilter pattern rests on),
    bloom_pass >= exact_hits, and the observed false-positive rate stays
    within 2x the analytic (1-e^(-kn/m))^k bound for the sf0.01 load
    factor (~740 bp)."""
    import math

    from s3_to_redshift_with_airflow_spark.plans.scale_ops import (
        _BF_BITS,
        _BF_K,
        q_bloom_prefilter_join,
    )

    r = q_bloom_prefilter_join(spark, "/root/testdata/sf0.01").collect()[0]
    assert r["missed"] == 0
    assert r["bloom_pass"] >= r["exact_hits"]
    assert r["bloom_pass"] - r["exact_hits"] == r["false_pos"]
    fill = 1.0 - math.exp(-_BF_K * r["n_keys"] / _BF_BITS)
    expected_bp = 10000.0 * fill**_BF_K
    assert 0 < r["fp_rate_bp"] < 2 * expected_bp


def test_robust_outliers_survive_contamination_where_zscore_masks(spark):
    """MAD outlier detection: 10% planted extreme values are ALL flagged
    while the tight bulk is not — and the planted contamination inflates
    the mean/std enough that a classic 3-sigma z-score misses every one
    of them (masking), which is the reason the robust estimator exists."""
    import statistics
    import tempfile

    vals = [10.0 + 0.01 * i for i in range(90)] + [1e6 + i for i in range(10)]
    rows = [(f"e{i}", "click", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id string, event_type string, value double")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        from s3_to_redshift_with_airflow_spark.plans import query_map

        out = query_map()["robust_outliers"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 100 and r["n_outliers"] == 10 and r["outlier_bp"] == 1000
    # the mean/std gate is masked by its own outliers: 3-sigma from the
    # contaminated mean/std flags nothing in the bulk AND nothing planted
    mu, sd = statistics.mean(vals), statistics.stdev(vals)
    assert all(abs(v - mu) <= 3 * sd for v in vals)


def test_bloom_semijoin_rows_equal_plain_semi_join(spark):
    """bloom_semijoin (prefilter + verify) is row-for-row identical to the
    plain left-semi join it accelerates — no false negatives survive the
    bitmap and no false positives survive the verify."""
    from s3_to_redshift_with_airflow_spark.operators.sketches import bloom_semijoin

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    keys = (
        spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
        .filter("o_orderpriority = '1-URGENT'")
        .selectExpr("o_orderkey as k")
        .distinct()
    )
    got = bloom_semijoin(li, "l_orderkey", keys, n_bits=2048).orderBy(
        "l_orderkey", "l_partkey"
    )
    want = li.join(
        keys, li["l_orderkey"] == keys["k"], "left_semi"
    ).orderBy("l_orderkey", "l_partkey")
    assert got.collect() == want.collect()


def test_bloom_bitmap_rejects_ragged_sizes(spark):
    """ADVICE r5: n_bits not a multiple of 32 would silently drop bit
    positions in the last partial word while probes index past the array
    end — the builder must refuse instead."""
    from s3_to_redshift_with_airflow_spark.operators.sketches import bloom_bitmap

    keys = spark.createDataFrame([(1,), (2,)], "k long")
    for bad_bits in (0, -32, 100, 31, 16383):
        try:
            bloom_bitmap(keys, "k", n_bits=bad_bits, k_hashes=3)
            raise AssertionError(f"accepted n_bits={bad_bits}")
        except ValueError:
            pass
    try:
        bloom_bitmap(keys, "k", n_bits=64, k_hashes=0)
        raise AssertionError("accepted k_hashes=0")
    except ValueError:
        pass


def test_ohlc_bars_tiebreak_and_partitioning_invariance(spark):
    """ohlc_bars: two rows sharing the bucket's min/max timestamp must
    resolve open/close by the seq tiebreaker (min_by/max_by over the
    (ts, seq) struct), and the result must be identical under any input
    partitioning."""
    from s3_to_redshift_with_airflow_spark.operators.timeseries import (
        ohlc_bars,
    )

    rows = [
        # same opening ts — event_id 1 wins open; same closing ts — id 6
        ("a", "2024-01-01 10:00:00", 2, 20.0),
        ("a", "2024-01-01 10:00:00", 1, 10.0),
        ("a", "2024-01-01 10:30:00", 3, 99.0),
        ("a", "2024-01-01 10:59:00", 5, 30.0),
        ("a", "2024-01-01 10:59:00", 6, 40.0),
        ("a", "2024-01-01 11:05:00", 7, 7.0),   # next bucket
        ("b", "2024-01-01 10:10:00", 8, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts string, event_id long, value double"
    ).select(
        "event_type", F.col("ts").cast("timestamp").alias("ts"),
        "event_id", "value",
    )
    out = {
        (r["event_type"], str(r["bucket_start"])): (
            r["open"], r["high"], r["low"], r["close"], r["n_rows"]
        )
        for r in ohlc_bars(
            df, group_cols=["event_type"], seq_col="event_id"
        ).collect()
    }
    assert out == {
        ("a", "2024-01-01 10:00:00"): (10.0, 99.0, 10.0, 40.0, 5),
        ("a", "2024-01-01 11:00:00"): (7.0, 7.0, 7.0, 7.0, 1),
        ("b", "2024-01-01 10:00:00"): (5.0, 5.0, 5.0, 5.0, 1),
    }
    again = {
        (r["event_type"], str(r["bucket_start"])): (
            r["open"], r["high"], r["low"], r["close"], r["n_rows"]
        )
        for r in ohlc_bars(
            df.repartition(7), group_cols=["event_type"], seq_col="event_id"
        ).collect()
    }
    assert again == out


def test_histogram_sketch_persistence_merge_and_accuracy(spark, tmp_path):
    """The histogram sketch family end-to-end: (a) quantiles served from
    the parquet-persisted per-day table after DELETING the raw events are
    bit-identical to the live composition (merge-of-days == direct is an
    exact equality — integer buckets, unlike HLL); (b) every histogram
    quantile is within one bucket width ABOVE the exact percentile and
    never below it (upper-boundary estimate contract)."""
    import shutil

    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        histogram_quantiles,
        value_histogram,
    )
    from s3_to_redshift_with_airflow_spark.sources.readers import (
        with_ts_from_nanos,
    )

    raw = str(tmp_path / "events_raw")
    spark.read.parquet(f"{SF_SMOKE}/events.parquet").write.parquet(raw)
    events = with_ts_from_nanos(spark.read.parquet(raw), "ts")
    width = 8.0
    live = value_histogram(events, grain_cols=["event_type"], width=width)
    want = {
        (r["event_type"], r["q_pct"]): (r["n_total"], r["est_value"])
        for r in histogram_quantiles(
            live, grain_cols=["event_type"], width=width
        ).collect()
    }
    # the operator's accuracy contract is against the DISCRETE covering
    # order statistic (the ceil(q*n/100)-th smallest value), not the
    # interpolated percentile (which anchors one order stat earlier and can
    # sit in the previous bucket)
    import math

    vals: dict[str, list[float]] = {}
    for r in events.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    exact = {}
    for et, xs in vals.items():
        xs.sort()
        for q in (50, 95, 99):
            exact[(et, q)] = xs[math.ceil(q * len(xs) / 100) - 1]

    hist_path = str(tmp_path / "hist_table")
    live.write.parquet(hist_path)
    shutil.rmtree(raw)  # the raw data is gone

    got = {
        (r["event_type"], r["q_pct"]): (r["n_total"], r["est_value"])
        for r in histogram_quantiles(
            spark.read.parquet(hist_path), grain_cols=["event_type"], width=width
        ).collect()
    }
    assert got == want  # stored table serves identical results
    for key, (_, est) in got.items():
        stat = exact[key]
        # est is the covering bucket's UPPER boundary: the covering order
        # statistic lies inside that bucket, i.e. in [est - width, est)
        assert est - width <= stat < est, (key, est, stat)


def test_kmv_sketch_table_survives_raw_data_deletion(spark, tmp_path):
    """KMV persist-and-serve: write the per-type sketch table to parquet,
    DELETE the raw copy, and the pairwise set-op table built by READING
    the stored sketches is bit-identical to the live composition — the
    same raw-data-independence contract the HLL family pins."""
    import shutil

    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        kmv_pair_ops,
        kmv_sketch_table,
    )

    raw = str(tmp_path / "events_raw")
    spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_type", "user_id"
    ).write.parquet(raw)
    events = spark.read.parquet(raw)
    sk_live = kmv_sketch_table(events, "user_id", "event_type", k=64)
    want = [tuple(r) for r in kmv_pair_ops(sk_live, k=64).collect()]

    sk_path = str(tmp_path / "kmv_table")
    sk_live.write.parquet(sk_path)
    shutil.rmtree(raw)  # the raw data is gone

    got = [
        tuple(r)
        for r in kmv_pair_ops(spark.read.parquet(sk_path), k=64).collect()
    ]
    assert got == want and len(got) == 10  # C(5,2) pairs


def test_kmv_estimator_quality_and_exact_small_sets(spark):
    """KMV estimator contract on a controlled universe: two groups of
    5,000 keys sharing 2,500 (true union 7,500, Jaccard 1/3). At k=256
    the union estimate must land within 4/sqrt(k) (±25%) and jaccard_ppm
    within ±0.15 absolute; a third 40-key group exercises the kp<k path,
    where union/intersection are EXACT."""
    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        kmv_pair_ops,
        kmv_sketch_table,
    )

    base = spark.range(7_500)
    a = base.filter(F.col("id") < 5_000).select(
        F.lit("a").alias("g"), F.col("id").alias("key")
    )
    b = base.filter(F.col("id") >= 2_500).select(
        F.lit("b").alias("g"), F.col("id").alias("key")
    )
    c = base.filter(F.col("id") < 40).select(
        F.lit("c").alias("g"), F.col("id").alias("key")
    )
    df = a.unionByName(b).unionByName(c)
    sk = kmv_sketch_table(df, "key", "g", k=256)
    rows = {
        (r.type_a, r.type_b): r for r in kmv_pair_ops(sk, k=256).collect()
    }
    ab = rows[("a", "b")]
    assert ab.kp == 256
    assert abs(ab.union_est - 7_500) <= 0.25 * 7_500
    assert abs(ab.jaccard_ppm / 1e6 - 1 / 3) <= 0.15
    assert abs(ab.intersect_est - 2_500) <= 0.40 * 2_500
    # c ⊂ a with |c| = 40 < k: merged sketch is a's bottom-k plus nothing
    # new — kp == 256 (a alone fills it), intersection estimated; but
    # (c, b)-style small-vs-small is exact when BOTH are under k:
    d = base.filter(F.col("id") < 20).select(
        F.lit("d").alias("g"), F.col("id").alias("key")
    )
    sk2 = kmv_sketch_table(c.unionByName(d), "key", "g", k=256)
    cd = kmv_pair_ops(sk2, k=256).collect()[0]
    assert (cd.kp, cd.union_est, cd.intersect_est) == (40, 40, 20)
    assert cd.jaccard_ppm == 20 * 1_000_000 // 40


def test_join_size_estimate_is_one_sided_and_tight(spark):
    """AMS/CMS inner-product join-size estimate: est >= exact ALWAYS
    (collisions only add cross terms), and at w=16384 vs this data's
    |A|*|B| the overestimate stays under 25%."""
    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    row = REGISTRY["join_size_estimate"].fn(spark, SF_SMOKE).collect()[0]
    assert row.est_n >= row.exact_n
    assert row.over_ppm == (row.est_n - row.exact_n) * 1_000_000 // row.exact_n
    assert row.est_n <= 1.25 * row.exact_n


def test_dp_noise_follows_geometric_tail(spark):
    """The DP mechanism's two-sided geometric noise, drawn over 4,000
    hashed uniforms, must match its stated law: P(mag >= t) ~ 2^(-t/2).
    Pins the inverse-CDF fixed-point math (a sign error or scale slip
    would skew the tail far outside these bands) and the sign balance."""
    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.classify import (
        log2_fp_sql,
    )

    lg = log2_fp_sql("u + 1", dialect="spark")
    rows = (
        spark.range(4_000)
        .select(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("dp:7:g"), F.col("id").cast("string"))),
                    1,
                    10,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("u"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(F.lit("dpsign:7:g"), F.col("id").cast("string"))
                        ),
                        1,
                        10,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 2
            ).alias("sgn"),
        )
        .select(F.expr(f"(2 * sgn - 1) * ((40 * 65536 - {lg}) div 32768)").alias("noise"))
        .collect()
    )
    mags = [abs(r.noise) for r in rows]
    n = len(mags)
    # P(mag >= 2) = 1/2, P(mag >= 4) = 1/4, P(mag >= 8) = 1/16
    for t, p in [(2, 0.5), (4, 0.25), (8, 0.0625)]:
        frac = sum(m >= t for m in mags) / n
        assert abs(frac - p) < 0.04, (t, frac)
    # P(noise > 0) = P(sgn=1) * P(mag >= 1) = 0.5 * 2^(-1/2) ~ 0.354
    pos = sum(r.noise > 0 for r in rows) / n
    neg = sum(r.noise < 0 for r in rows) / n
    assert abs(pos - 0.354) < 0.04 and abs(neg - 0.354) < 0.04


def test_kmv_merge_incremental_equals_batch_and_associates(spark):
    """KMV mergeability: fold per-half sketches and get BIT-IDENTICAL
    arrays to the from-scratch build over all rows (bottom-k of bottom-k
    unions == bottom-k of the union), and fold order doesn't matter —
    the contract that lets a daily sketch table maintain a running
    sketch without rescanning history."""
    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        kmv_merge,
        kmv_sketch_table,
    )

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_type", "user_id", "event_id"
    )
    h1 = ev.filter(F.col("event_id") % 3 == 0)
    h2 = ev.filter(F.col("event_id") % 3 == 1)
    h3 = ev.filter(F.col("event_id") % 3 == 2)
    k = 64
    sk = lambda df: kmv_sketch_table(df, "user_id", "event_type", k=k)  # noqa: E731

    def rows(df):
        return sorted((r.g, tuple(r.hs), r.n_kept) for r in df.collect())

    batch = rows(sk(ev))
    incr = rows(kmv_merge(kmv_merge(sk(h1), sk(h2), k=k), sk(h3), k=k))
    incr2 = rows(kmv_merge(sk(h1), kmv_merge(sk(h2), sk(h3), k=k), k=k))
    assert incr == batch
    assert incr2 == batch


def test_compact_parquet_dir_preserves_data_and_sizes_files(spark, tmp_path):
    """Compaction must be a pure layout change: same rows (verified by a
    full-column checksum), ceil(n/target) files on disk, and every output
    file near the even split."""
    from s3_to_redshift_with_airflow_spark.operators.relational import (
        table_checksum,
    )
    from s3_to_redshift_with_airflow_spark.sources.writers import (
        _count_part_files,
        compact_parquet_dir,
    )

    src = str(tmp_path / "scattered")
    dst = str(tmp_path / "compacted")
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    ev.repartition(16).write.parquet(src)
    before = table_checksum(spark.read.parquet(src)).collect()[0]

    rep = compact_parquet_dir(spark, src, dst, target_rows_per_file=300)
    n = before.n_rows
    assert rep["n_rows"] == n
    assert rep["n_files_in"] == 16 == _count_part_files(spark, src)
    want_files = -(-n // 300)
    assert rep["n_files_out"] == want_files == _count_part_files(spark, dst)

    after = table_checksum(spark.read.parquet(dst)).collect()[0]
    assert tuple(after) == tuple(before)  # bit-identical multiset of rows


def test_evolved_union_scan_semantics(spark, tmp_path):
    """Rename mapped (one column, not forked), added column null-filled
    for old generations, lineage column carries the version, and order of
    the versions list does not change the multiset of rows."""
    from s3_to_redshift_with_airflow_spark.sources.readers import (
        evolved_union_scan,
    )

    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, old_name string"
    ).write.parquet(v1)
    spark.createDataFrame(
        [(3, "c", 30.0)], "id bigint, new_name string, score double"
    ).write.parquet(v2)

    out = evolved_union_scan(
        spark,
        [("v1", v1), ("v2", v2)],
        renames={"v1": {"old_name": "new_name"}},
    )
    assert sorted(out.columns) == ["id", "new_name", "score", "src_version"]
    rows = {r.id: (r.new_name, r.score, r.src_version) for r in out.collect()}
    assert rows == {
        1: ("a", None, "v1"),
        2: ("b", None, "v1"),
        3: ("c", 30.0, "v2"),
    }
    flipped = evolved_union_scan(
        spark,
        [("v2", v2), ("v1", v1)],
        renames={"v1": {"old_name": "new_name"}},
    )
    assert sorted(map(tuple, out.select(sorted(out.columns)).collect())) == sorted(
        map(tuple, flipped.select(sorted(out.columns)).collect())
    )
    # empty version list refused
    try:
        evolved_union_scan(spark, [])
        raise AssertionError("accepted empty versions")
    except ValueError:
        pass


def test_cms_merge_equals_direct_build_and_survives_deletion(spark, tmp_path):
    """Count-min merge is ADDITION, so merge-of-parts == direct build is
    a bit equality (cell for cell), and the rollup served from stored
    sketches survives raw-data deletion."""
    import shutil

    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        cms_merge,
        cms_point_estimate,
        cms_sketch_table,
    )

    raw = str(tmp_path / "ev_raw")
    spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "user_id", F.to_date("ts").alias("day")
    ).write.parquet(raw)
    ev = spark.read.parquet(raw)

    direct = cms_sketch_table(ev, "user_id", d=2, w=64)
    daily = cms_sketch_table(ev, "user_id", d=2, w=64, grain_cols=["day"])
    merged_live = cms_merge(daily, grain_cols=["day"])
    cell = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert cell(merged_live) == cell(direct)  # equality, not estimate-close

    sk_path = str(tmp_path / "cms_daily")
    daily.write.parquet(sk_path)
    # materialize the probe keys — after the deletion nothing may read raw
    keys = [
        (r.user_id,)
        for r in ev.select("user_id").distinct().limit(10).collect()
    ]
    probes = spark.createDataFrame(keys, "user_id bigint")
    want = cell(
        cms_point_estimate(merged_live, probes, "user_id", d=2, w=64)
    )
    shutil.rmtree(raw)  # the raw data is gone
    got = cell(
        cms_point_estimate(
            cms_merge(spark.read.parquet(sk_path), grain_cols=["day"]),
            probes,
            "user_id",
            d=2,
            w=64,
        )
    )
    assert got == want


def test_mg_summary_guarantee_on_planted_skew(spark):
    """On a Zipf-like stream where the guarantee BITES: key 0 holds 30%
    of 10,000 rows (>> n/(k+1) at k=9), so it MUST survive both the
    per-part summaries and the merge, with counter within the summed
    offsets of its true count; every estimate is an underestimate; and
    the merge result is invariant to merge shape (k-way vs pairwise)."""
    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        mg_merge,
        mg_summary,
    )

    n, k = 10_000, 9
    # key 0: 30%; keys 1..4: 8% each; the rest spread over 200 keys
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 3, F.lit(0))
        .when(F.col("id") % 10 < 7, (F.col("id") % 4) + 1)
        .otherwise((F.col("id") % 200) + 10)
        .alias("key"),
        (F.col("id") % 4).alias("part"),
    )
    daily = mg_summary(df, "key", k=k, grain_cols=["part"])
    merged = {r.key: r.counter for r in mg_merge(daily, k=k, grain_cols=["part"]).collect()}
    exact = {r.key: r.cnt for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()}

    assert 0 in merged  # frequency 3000 > n/(k+1) = 1000 -> guaranteed
    for key, est in merged.items():
        assert est <= exact[key]  # underestimates only
        assert exact[key] - est <= n // (k + 1) * 5  # summed-offset bound (4 parts + merge)

    # merge-shape invariance: ((p0+p1)+(p2+p3)) == k-way
    parts = [
        daily.filter(F.col("part") == p).drop("part") for p in range(4)
    ]
    pair = mg_merge(
        mg_merge(parts[0].unionByName(parts[1]), k=k)
        .unionByName(mg_merge(parts[2].unionByName(parts[3]), k=k)),
        k=k,
    )
    # pairwise folds give a VALID summary too (not necessarily identical
    # counters — offsets differ by tree), so assert the guarantee, not
    # equality: the heavy key survives with a bounded undercount
    pm = {r.key: r.counter for r in pair.collect()}
    assert 0 in pm and pm[0] <= exact[0]
    assert exact[0] - pm[0] <= n // (k + 1) * 5


def test_mg_summary_survives_raw_data_deletion(spark, tmp_path):
    """The MG summary table persists and serves like the other sketch
    families: write per-part summaries, delete the raw rows, merged
    result unchanged."""
    import shutil

    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.sketches import (
        mg_merge,
        mg_summary,
    )

    raw = str(tmp_path / "ev_raw")
    spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "user_id", F.to_date("ts").alias("day")
    ).write.parquet(raw)
    ev = spark.read.parquet(raw)
    daily = mg_summary(ev, "user_id", k=10, grain_cols=["day"])
    want = sorted(tuple(r) for r in mg_merge(daily, k=10, grain_cols=["day"]).collect())

    sk = str(tmp_path / "mg_daily")
    daily.write.parquet(sk)
    shutil.rmtree(raw)
    got = sorted(
        tuple(r)
        for r in mg_merge(
            spark.read.parquet(sk), k=10, grain_cols=["day"]
        ).collect()
    )
    assert got == want


def test_weighted_median_matches_repetition_semantics(spark, tmp_path):
    """Weight k must act exactly like k repeated rows (the definition),
    pinned by comparing against the unweighted lower median of the
    expanded multiset; all-equal weights reduce to the plain lower
    median."""
    import os

    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    rows = [
        ("a", 1.0, 1), ("a", 2.0, 3), ("a", 10.0, 1),   # expanded: 1,2,2,2,10 -> median 2
        ("b", 5.0, 2), ("b", 7.0, 2),                    # expanded: 5,5,7,7 -> lower median 5
        ("c", 4.0, 1),                                   # single -> 4
    ]
    # the registry query derives wt = event_id % 5 + 1, so craft event_ids
    data = []
    eid = 0
    for g, v, wt in rows:
        # find an event_id with event_id % 5 + 1 == wt
        while eid % 5 + 1 != wt:
            eid += 1
        data.append((eid, g, v))
        eid += 1
    import datetime

    df = spark.createDataFrame(
        [(e, datetime.datetime(2024, 1, 1), 1, g, v, "{}") for e, g, v in data],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "events.parquet"))
    got = {
        r.event_type: (r.w_median, r.total_weight)
        for r in REGISTRY["weighted_median"].fn(spark, d).collect()
    }
    assert got == {"a": (2.0, 5), "b": (5.0, 4), "c": (4.0, 1)}


def test_interval_coalesce_semantics(spark):
    """Islands merge overlaps AND touches, keep true gaps apart, count
    members, and never mix keys; contained intervals collapse."""
    from s3_to_redshift_with_airflow_spark.operators.timeseries import (
        interval_coalesce,
    )

    iv = spark.createDataFrame(
        [
            # key 1: [0,10] + [5,20] overlap; [20,25] touches -> one island
            (1, 0, 10), (1, 5, 20), (1, 20, 25),
            # key 1: [30,40] is a separate island; [32,35] contained
            (1, 30, 40), (1, 32, 35),
            # key 2: same coordinates must not merge with key 1
            (2, 0, 10),
        ],
        "k bigint, s bigint, e bigint",
    )
    got = sorted(
        tuple(r)
        for r in interval_coalesce(iv, ["k"], "s", "e").collect()
    )
    assert got == [
        (1, 0, 25, 3),
        (1, 30, 40, 2),
        (2, 0, 10, 1),
    ]


def test_dp_sum_release_clamps_and_scales_noise(spark):
    """The sum mechanism's two preconditions: per-row contributions clamp
    to [0, C] (a 10^9 outlier moves the clamped sum by exactly C), and
    the noise is a multiple of the sensitivity C."""
    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    rows = REGISTRY["dp_sum_release"].fn(spark, SF_SMOKE).collect()
    assert rows and all(r.noise % 100 == 0 for r in rows)
    assert all(r.released >= 0 for r in rows)
    assert all(r.released == max(0, r.sum_exact + r.noise) for r in rows)
    # clamp: recompute one group's clamped sum independently
    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    want = (
        ev.filter(F.col("event_type") == rows[0].event_type)
        .agg(
            F.sum(
                F.least(
                    F.greatest(F.floor("value").cast("bigint"), F.lit(0)),
                    F.lit(100),
                )
            ).cast("bigint")
        )
        .collect()[0][0]
    )
    assert rows[0].sum_exact == want


def test_auto_salted_join_equals_plain_and_salts(spark):
    """The advisor-derived salted join returns exactly the plain join's
    aggregate, and the executed plan really carries the salt key."""
    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    import pyspark.sql.functions as F

    got = {
        r.event_type: (r.n_rows, r.distinct_users)
        for r in REGISTRY["auto_salted_join_agg"].fn(spark, SF_SMOKE).collect()
    }
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    want = {
        r.event_type: (r.n_rows, r.du)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("du"),
        )
        .collect()
    }
    assert got == want


def test_linear_attribution_conserves_credit(spark, tmp_path):
    """Hand-computed: user A has 2 views + 1 click + 2 purchases ->
    views get 2/3 of 2e6, click 1/3; user B purchases with no touches ->
    contributes nothing (no row survives the inner join). Total credit
    never exceeds purchases*1e6."""
    import datetime
    import os

    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0, 1, "view", 1.0, "{}"),
        (3, t0, 1, "click", 1.0, "{}"),
        (4, t0, 1, "purchase", 1.0, "{}"),
        (5, t0, 1, "purchase", 1.0, "{}"),
        (6, t0, 2, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "events.parquet"))
    got = {
        r.channel: r.credit_ppm
        for r in REGISTRY["linear_attribution"].fn(spark, d).collect()
    }
    assert got == {
        "view": 2 * 2 * 1_000_000 // 3,   # 1333333 (floor dust: 1 ppm lost)
        "click": 1 * 2 * 1_000_000 // 3,  # 666666
    }
    assert sum(got.values()) <= 2 * 1_000_000


def test_conversion_lag_semantics(spark, tmp_path):
    """Hand-computed: purchase BEFORE the first click doesn't count; the
    first at-or-after one does; never-purchasers excluded."""
    import datetime
    import os

    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)

    def ev(eid, minutes, uid, typ):
        return (eid, t0 + datetime.timedelta(minutes=minutes), uid, typ, 1.0, "{}")

    rows = [
        ev(1, 0, 1, "click"), ev(2, -30, 1, "purchase"), ev(3, 20, 1, "purchase"),
        ev(4, 0, 2, "click"),                       # never purchases
        ev(5, 0, 3, "click"), ev(6, 60, 3, "purchase"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "events.parquet"))
    r = REGISTRY["conversion_lag_quantiles"].fn(spark, d).collect()[0]
    # lags: user1 = 20 min, user3 = 60 min -> p50 = 40 min (interpolated)
    assert r.n_users == 2
    assert r.p50_lag_s == (20 * 60 + 60 * 60) / 2
    assert r.p90_lag_s == 20 * 60 + 0.9 * 40 * 60  # (1-h)lo + h*hi, h=.9(n-1)


def test_trending_rank_delta_semantics(spark):
    """Rank deltas: every day-1 row is a NULL-delta new entrant; later
    days' deltas equal prev_rnk - rnk; top-10 only; ties broken by key."""
    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    rows = REGISTRY["trending_rank_delta"].fn(spark, SF_SMOKE).collect()
    days = sorted({r.day for r in rows})
    first = [r for r in rows if r.day == days[0]]
    assert all(r.prev_rnk is None and r.rank_delta is None for r in first)
    later = [r for r in rows if r.day != days[0] and r.prev_rnk is not None]
    assert later and all(r.rank_delta == r.prev_rnk - r.rnk for r in later)
    for d in days:
        rnks = [r.rnk for r in rows if r.day == d]
        assert sorted(rnks) == list(range(1, len(rnks) + 1)) and max(rnks) <= 10


def test_histogram_psi_properties(spark, tmp_path):
    """PSI from the stored histogram: (a) identical windows → psi_fp == 0
    for every group; (b) planted drift → psi_fp > 0 and every term-sum
    nonnegative by the shared-sign argument; (c) serving from the
    parquet-written histogram table is bit-identical to the live frame;
    (d) one-window-only buckets are excluded and their mass reported, not
    smoothed."""
    from s3_to_redshift_with_airflow_spark.operators.classify import (
        log2_fp_sql,
    )
    from s3_to_redshift_with_airflow_spark.plans.scale_ops import (
        histogram_psi,
    )

    lg = lambda x: log2_fp_sql(x, dialect="spark")  # noqa: E731
    rows = []
    # week A: values 0..63 uniform; week B: same uniform (no drift) for
    # group "u", shifted mass for group "d"
    for day, tag in (("2024-01-02", "A"), ("2024-01-23", "B")):
        for v in range(64):
            rows.append(("u", day, v // 8, 10))
        if tag == "A":
            rows += [("d", day, b, 100) for b in range(4)]
        else:
            rows += [("d", day, 0, 300), ("d", day, 1, 100)]  # mass shifts
            rows += [("d", day, 9, 200)]  # new bucket only in B
    hist = spark.createDataFrame(
        rows, "event_type string, day string, bucket long, n long"
    ).select("event_type", F.to_date("day").alias("day"), "bucket", "n")

    out = {
        r["event_type"]: r
        for r in histogram_psi(
            hist, ("2024-01-01", "2024-01-07"), ("2024-01-22", "2024-01-28"), lg
        ).collect()
    }
    assert out["u"]["psi_fp"] == 0 and out["u"]["skipped_a_ppm"] == 0
    assert out["d"]["psi_fp"] > 0
    # bucket 9 exists only in window B: excluded, mass reported
    assert out["d"]["skipped_b_ppm"] > 0
    assert out["d"]["n_buckets"] == 2

    # stored-table serve is bit-identical
    p = str(tmp_path / "hist")
    hist.write.parquet(p)
    stored = {
        r["event_type"]: tuple(r)
        for r in histogram_psi(
            spark.read.parquet(p),
            ("2024-01-01", "2024-01-07"),
            ("2024-01-22", "2024-01-28"),
            lg,
        ).collect()
    }
    assert stored == {k: tuple(v) for k, v in out.items()}


def test_drift_gate_equals_ungated_when_threshold_high(spark):
    """VERDICT r7 #6's done-criterion: with no drift above the threshold
    the gated selection is row-identical to the ungated query — the gate
    is pure pass-through unless the PSI arithmetic says otherwise."""
    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.plans.scale_ops import (
        _drift_gated_selection,
        _DRIFT_THRESH_FP,
    )

    sf = "/root/testdata/sf0.01"
    gated = _drift_gated_selection(spark, sf, _DRIFT_THRESH_FP)
    ungated = _drift_gated_selection(spark, sf, 1 << 62)
    # decision consistency on the real threshold: zeroed iff drifted
    for r in gated.collect():
        assert r["drifted"] == (r["psi_fp"] > _DRIFT_THRESH_FP)
        if r["drifted"]:
            assert r["n_selected"] == 0 and r["selected_value"] == 0.0
    # at an unreachable threshold nothing is gated, and every row matches
    # the plain selection the ungated twin computes
    un = {r["event_type"]: r for r in ungated.collect()}
    assert not any(r["drifted"] for r in un.values())
    g = {r["event_type"]: r for r in gated.collect()}
    for et, r in un.items():
        if not g[et]["drifted"]:
            assert (g[et]["n_selected"], g[et]["selected_value"]) == (
                r["n_selected"], r["selected_value"],
            )
        assert g[et]["psi_fp"] == r["psi_fp"]


def test_histogram_quantiles_interval_contains_exact_quantile(spark):
    """The served [est_lo, est_hi) interval must CONTAIN the exact type-1
    (ceil-rank element) quantile — the sketch's bounded-error contract,
    checked against a driver-side exact computation."""
    import math

    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    got = {
        (r["event_type"], r["q_pct"]): r
        for r in REGISTRY["histogram_quantiles"].fn(spark, sf).collect()
    }
    rows = (
        spark.read.parquet(f"{sf}/events.parquet")
        .filter("value IS NOT NULL")
        .select("event_type", "value")
        .collect()
    )
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for et, vals in by_type.items():
        vals.sort()
        for q in (50, 95):
            exact = vals[math.ceil(len(vals) * q / 100) - 1]
            r = got[(et, q)]
            assert r["est_lo"] <= exact < r["est_hi"], (
                f"{et} p{q}: exact {exact} outside "
                f"[{r['est_lo']}, {r['est_hi']})"
            )
            assert r["total_n"] == len(vals)
