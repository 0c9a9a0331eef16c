"""Similarity search: brute-force exactness + hyperplane-LSH recall."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from s3_to_redshift_with_airflow_spark.functions.vectors import cosine, dot, l2_normalize
from s3_to_redshift_with_airflow_spark.operators.similarity import (
    brute_force_topk,
    hyperplane_lsh_topk,
)


def test_cosine_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0]), ([1.0, 0.0], [-1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    vals = [r["c"] for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert vals[0] == pytest.approx(0.0)
    assert vals[1] == pytest.approx(1.0)
    assert vals[2] == pytest.approx(-1.0)


def test_zero_vector_guard(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>")
    assert df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"] == 0.0


def test_l2_normalize(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "v array<double>")
    out = df.select(l2_normalize(F.col("v")).alias("n")).collect()[0]["n"]
    assert out == pytest.approx([0.6, 0.8])


def test_bruteforce_topk_orders_and_excludes_self(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=5).collect()
    assert len(out) == 5
    assert all(r["vec_id"] != 0 for r in out)
    sims = [r["cos_sim"] for r in out]
    assert sims == sorted(sims, reverse=True)


def test_lsh_topk_recall_vs_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, k=10).collect()
    approx = hyperplane_lsh_topk(emb, queries, k=10, n_bits=16, n_bands=8).collect()
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # measured 0.96 at these parameters on the driver testdata; 0.9 leaves
    # margin for data regeneration while catching any parameter regression
    assert recall >= 0.9, f"LSH recall {recall} too low"
    # precision of scores: any pair returned must carry the exact cosine
    exact_scores = {(r["query_id"], r["vec_id"]): r["cos_sim"] for r in exact}
    for r in approx:
        k = (r["query_id"], r["vec_id"])
        if k in exact_scores:
            assert r["cos_sim"] == exact_scores[k]


def test_sign_lsh_neardup_recall_and_precision(spark):
    """semantic_neardup's blocking vs unblocked brute force: every returned
    pair is a true pair with the exact cosine (precision 1.0), and recall
    stays ≥0.9 (measured 0.966 on the driver testdata at cos ≥ 0.4 — the
    misses are boundary pairs; true near-dups are essentially never lost)."""
    from s3_to_redshift_with_airflow_spark.functions.vectors import dot, norm
    from s3_to_redshift_with_airflow_spark.operators.similarity import (
        sign_lsh_neardup_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
                   norm(F.col("embedding")).alias("na"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
                   norm(F.col("embedding")).alias("nb"))
    brute = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.4)
        .collect()
    }
    blocked = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in sign_lsh_neardup_pairs(emb, threshold=0.4).collect()
    }
    assert set(blocked) <= set(brute)  # precision 1.0
    for k, v in blocked.items():
        assert v == brute[k]  # exact cosine, bit-identical
    recall = len(blocked) / len(brute)
    assert recall >= 0.9, f"sign-LSH recall {recall} too low"


def test_ranking_metrics_known_values(spark):
    """ranking_metrics against hand-computed values: a perfect run scores
    ndcg=mrr=1; a run with the relevant docs shifted down scores the
    hand-folded fixed-point DCG ratio; a run with no relevant results
    scores zeros."""
    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.retrieval import (
        dcg_discounts,
        ranking_metrics,
    )

    k = 3
    disc = dcg_discounts(k)
    truth = spark.createDataFrame(
        [(q, d, r) for q in (1, 2, 3) for d, r in [(10, 3), (11, 2), (12, 1)]],
        "query_id long, vec_id long, rel long",
    )
    run = spark.createDataFrame(
        # q1: perfect order; q2: relevant docs at ranks 2,3 (13 irrelevant
        # first); q3: nothing relevant
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 13, 1), (2, 10, 2), (2, 11, 3),
         (3, 13, 1), (3, 14, 2), (3, 15, 3)],
        "query_id long, vec_id long, rk long",
    )
    got = {
        r["query_id"]: (r["n_hits"], r["precision_at_k"], r["mrr"], r["ndcg"])
        for r in ranking_metrics(run, truth, k=k).collect()
    }
    idcg = 3 * disc[1] + 2 * disc[2] + 1 * disc[3]
    assert got[1] == (3, 1.0, 1.0, 1.0)
    q2_dcg = 3 * disc[2] + 2 * disc[3]
    assert got[2] == (2, 2.0 / 3.0, 0.5, q2_dcg / idcg)
    assert got[3] == (0, 0.0, 0.0, 0.0)
