"""Triangle counting + PMI collocations: hand-computed graph/corpus
parity, orientation correctness on hub-shaped graphs, and determinism
under repartitioning."""

from __future__ import annotations

import itertools
import math

from s3_to_redshift_with_airflow_spark.operators.graph import triangle_counts
from s3_to_redshift_with_airflow_spark.plans.registry import REGISTRY

from .conftest import SF_SMOKE


def _py_triangles(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Brute-force per-node triangle counts (the O(n^3) reference)."""
    es = {tuple(sorted(e)) for e in edges}
    nodes = sorted({u for e in es for u in e})
    out: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (a, c) in es and (b, c) in es:
            for n in (a, b, c):
                out[n] = out.get(n, 0) + 1
    return out


def _run(spark, edges):
    df = spark.createDataFrame(edges, "u1 long, u2 long")
    got = {r["node"]: r["n_tri"] for r in triangle_counts(df).collect()}
    assert got == _py_triangles(edges)
    return got


def test_k4_every_node_in_three_triangles(spark):
    k4 = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    got = _run(spark, k4)
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # K4 = 4 triangles, 3 per node


def test_hub_graph_orientation(spark):
    # Star hub (node 0 joined to 1..6) plus one rim edge: exactly one
    # triangle (0,1,2). A naive wedge count would enumerate C(6,2)=15
    # hub wedges; orientation sends rim->hub so the hub generates none.
    edges = [(0, i) for i in range(1, 7)] + [(1, 2)]
    got = _run(spark, edges)
    assert got == {0: 1, 1: 1, 2: 1}


def test_triangle_free_graph_empty(spark):
    # C4 cycle + a pendant: no triangles at all.
    assert _run(spark, [(0, 1), (1, 2), (2, 3), (0, 3), (3, 4)]) == {}


def test_degree_ties_break_by_node_id(spark):
    # Triangle among three degree-2 nodes: all degrees tie, so the
    # orientation falls back to node-id order — still exactly one count.
    assert _run(spark, [(10, 20), (20, 30), (10, 30)]) == {10: 1, 20: 1, 30: 1}


def test_registry_triangle_count_partition_invariant(spark):
    fn = REGISTRY["triangle_count"].fn
    base = {r["node"]: r["n_tri"] for r in fn(spark, SF_SMOKE).collect()}
    assert sum(base.values()) % 3 == 0  # every triangle credits 3 corners
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = {r["node"]: r["n_tri"] for r in fn(spark, SF_SMOKE).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert again == base


def test_token_pmi_matches_float_log2(spark):
    """pmi_fp tracks true log2 PMI within the documented fixed-point
    interpolation error (~0.086 bit per log term, 4 terms)."""
    rows = REGISTRY["token_pmi"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["c_xy"] >= 5
        assert r["c_left"] >= r["c_xy"] and r["c_right"] >= r["c_xy"]
    # Exact-integer identity: per-row PMI recomputed in Python from the
    # row's own counts must equal the Spark/oracle fixed-point value.
    def lg_fp(x: int, scale: int = 65536) -> int:
        m = x.bit_length() - 1
        p = 1 << m
        return m * scale + ((x - p) * scale) // p

    n_totals = set()
    # Recover n_total by inverting one row (pmi = lg(cxy)+lg(N)-lg(cl)-lg(cr)).
    for r in rows[:50]:
        lgN = r["pmi_fp"] - lg_fp(r["c_xy"]) + lg_fp(r["c_left"]) + lg_fp(
            r["c_right"]
        )
        n_totals.add(lgN)
    assert len(n_totals) == 1  # every row shares the same corpus total term
    lgN = n_totals.pop()
    # The shared term must be a plausible log2 of a corpus-scale bigint and
    # the float PMI must agree within the documented interpolation error.
    for r in rows[:50]:
        approx = (
            lg_fp(r["c_xy"]) + lgN - lg_fp(r["c_left"]) - lg_fp(r["c_right"])
        ) / 65536
        n_est = 2 ** (lgN / 65536)
        true = math.log2(r["c_xy"] * n_est / (r["c_left"] * r["c_right"]))
        assert abs(approx - true) < 4 * 0.09


def test_token_pmi_partition_invariant(spark):
    fn = REGISTRY["token_pmi"].fn
    key = lambda r: (r["w1"], r["w2"])  # noqa: E731
    base = {key(r): r["pmi_fp"] for r in fn(spark, SF_SMOKE).collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        again = {key(r): r["pmi_fp"] for r in fn(spark, SF_SMOKE).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert again == base


def test_gram_matrix_matches_numpy_and_is_psd(spark):
    """Registry Gram vs a numpy reference over Python-side re-quantized
    codes, plus positive-semidefiniteness of the assembled matrix (what
    the downstream driver-side eigendecomposition relies on)."""
    import math

    import numpy as np

    rows = REGISTRY["gram_matrix_int8"].fn(spark, SF_SMOKE).collect()
    d = 64
    assert len(rows) == d * (d + 1) // 2
    G = np.zeros((d, d), dtype=np.int64)
    n_vecs = {r["n_vecs"] for r in rows}
    assert len(n_vecs) == 1  # every cell saw every vector exactly once
    for r in rows:
        G[r["i"], r["j"]] = r["g"]
        G[r["j"], r["i"]] = r["g"]
    vecs = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("embedding")
        .collect()
    )
    Q = []
    for (v,) in vecs:
        maxabs = max(abs(x) for x in v)
        scale = 127.0 / maxabs if maxabs > 0 and not math.isinf(127.0 / maxabs) else 0.0
        Q.append([min(max(int(math.floor(x * scale + 0.5)), -127), 127) for x in v])
    Q = np.array(Q, dtype=np.int64)
    assert Q.shape[0] == n_vecs.pop()
    assert np.array_equal(G, Q.T @ Q)
    # X'X is PSD by construction; integer arithmetic must preserve that.
    assert np.linalg.eigvalsh(G.astype(np.float64)).min() > -1e-6


def test_clustering_coefficient_invariants(spark):
    """lcc is a proper ratio: 0 for degree<2 nodes, ≤ 1.0 (65536 fp)
    everywhere, and consistent with the node's own triangle count."""
    rows = REGISTRY["clustering_coefficient"].fn(spark, SF_SMOKE).collect()
    tri = {
        r["node"]: r["n_tri"]
        for r in REGISTRY["triangle_count"].fn(spark, SF_SMOKE).collect()
    }
    assert rows
    for r in rows:
        if r["degree"] < 2:
            assert r["lcc_fp"] == 0
        else:
            assert 0 <= r["lcc_fp"] <= 65536
            expect = (2 * r["n_tri"] * 65536) // (r["degree"] * (r["degree"] - 1))
            assert r["lcc_fp"] == expect
        assert tri.get(r["node"], 0) == r["n_tri"]


def test_gram_fast_path_matches_jvm_twin(spark):
    """The Arrow/numpy fast path must reproduce the JVM explode plan's
    cells bit-for-bit (the sanctioned-Python bar: same oracle, same
    integers) — including under a different partitioning, where each
    partition emits a differently-sliced partial."""
    jvm = {
        (r["i"], r["j"]): (r["g"], r["n_vecs"])
        for r in REGISTRY["gram_matrix_int8"].fn(spark, SF_SMOKE).collect()
    }
    fast = {
        (r["i"], r["j"]): (r["g"], r["n_vecs"])
        for r in REGISTRY["gram_matrix_int8_fast"].fn(spark, SF_SMOKE).collect()
    }
    assert fast == jvm
    from s3_to_redshift_with_airflow_spark.operators.clustering import (
        gram_int8_arrow,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").repartition(7)
    repart = {
        (r["i"], r["j"]): (r["g"], r["n_vecs"])
        for r in gram_int8_arrow(emb).collect()
    }
    assert repart == jvm
