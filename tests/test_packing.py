"""Sequence packing: exact window assignment, straddling, invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_to_redshift_with_airflow_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    # one shard; token counts chosen to exercise exact-fit, packing, and
    # straddling at capacity 8: cum = 3, 8, 20, 21
    rows = [
        (1, "a", 3),  # seq 0 [0,3)
        (2, "a", 5),  # seq 0 [3,8) — exact fill
        (3, "a", 12),  # straddles seq 1 (8 tok) and seq 2 (4 tok)
        (4, "a", 1),  # seq 2
        (10, "b", 9),  # second shard: straddles seq 0 (8) / seq 1 (1)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, toks long")


def test_pack_sequences_exact(docs):
    out = pack_sequences(
        docs, capacity=8, token_count_col=F.col("toks")
    ).collect()
    got = {
        (r["shard"], r["seq_id"], r["doc_id"]): (r["seq_tokens"], r["doc_offset"])
        for r in out
    }
    assert got == {
        ("a", 0, 1): (3, 0),
        ("a", 0, 2): (5, 0),
        ("a", 1, 3): (8, 0),   # first 8 tokens of doc 3
        ("a", 2, 3): (4, 8),   # remaining 4, starting at offset 8
        ("a", 2, 4): (1, 0),
        ("b", 0, 10): (8, 0),
        ("b", 1, 10): (1, 8),
    }


def test_pack_sequences_invariants(docs):
    packed = pack_sequences(docs, capacity=8, token_count_col=F.col("toks"))
    # each doc's slices sum to its token count
    per_doc = packed.groupBy("doc_id").agg(F.sum("seq_tokens").alias("s")).collect()
    truth = {r["doc_id"]: r["toks"] for r in docs.collect()}
    assert {r["doc_id"]: r["s"] for r in per_doc} == truth
    # every window except the last per shard is exactly full
    stats = {r["shard"]: r for r in packing_stats(packed, capacity=8).collect()}
    assert stats["a"]["n_windows"] == 3 and stats["a"]["full_windows"] == 2
    assert stats["b"]["n_windows"] == 2 and stats["b"]["full_windows"] == 1
    assert stats["a"]["total_tokens"] == 21 and stats["b"]["total_tokens"] == 9


def test_pack_sequences_rejects_bad_capacity(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, capacity=0, token_count_col=F.col("toks"))


def test_quantize_int8_roundtrip(spark):
    from s3_to_redshift_with_airflow_spark.functions.vectors import (
        int_dot,
        quant_scale,
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0]), (3, [127.0, -127.0, 63.5])],
        "vec_id long, v array<double>",
    ).select(
        "vec_id",
        quant_scale(F.col("v")).alias("s"),
        quantize_int8(F.col("v")).alias("q"),
        int_dot(quantize_int8(F.col("v")), quantize_int8(F.col("v"))).alias("nsq"),
    )
    rows = {r["vec_id"]: r for r in df.collect()}
    # max|x|=2 → scale 63.5; codes floor(x*63.5+0.5) = 64, -127, 32
    assert rows[1]["q"] == [64, -127, 32]
    assert rows[1]["nsq"] == 64 * 64 + 127 * 127 + 32 * 32
    # zero vector: scale 0, all-zero codes
    assert rows[2]["s"] == 0.0 and rows[2]["q"] == [0, 0, 0]
    # extreme values stay clamped to ±127
    assert rows[3]["q"] == [127, -127, 64]


def test_chunk_documents_covers_every_token_without_redundancy(spark):
    from s3_to_redshift_with_airflow_spark.functions.text import token_count
    from s3_to_redshift_with_airflow_spark.operators.packing import chunk_documents
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    W, S = 32, 16
    out = chunk_documents(docs, chunk_tokens=W, stride=S)
    nt = {r["doc_id"]: r["n"] for r in docs.select("doc_id", token_count(F.col("text")).alias("n")).collect()}
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(nt)  # every doc chunked, even short ones
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        n = nt[doc_id]
        # contiguous indices from 0
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        # full coverage: last chunk reaches the final token
        last = chunks[-1]
        assert last["chunk_idx"] * S + last["chunk_n_tokens"] == n
        # no redundant trailing chunk: each non-first chunk extends coverage
        for c in chunks[1:]:
            assert c["chunk_idx"] * S + c["chunk_n_tokens"] > (c["chunk_idx"] - 1) * S + W or c["chunk_n_tokens"] == W
        # all full-size except possibly the last
        assert all(c["chunk_n_tokens"] == W for c in chunks[:-1])
        assert 1 <= last["chunk_n_tokens"] <= W


def test_chunk_documents_overlap_is_exact(spark):
    """Consecutive chunks share exactly W - S tokens of text."""
    from s3_to_redshift_with_airflow_spark.operators.packing import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    W, S = 32, 16
    out = chunk_documents(docs, chunk_tokens=W, stride=S).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    checked = 0
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_idx"])
        for a, b in zip(chunks, chunks[1:]):
            ta, tb = a["chunk_text"].split(" "), b["chunk_text"].split(" ")
            assert ta[S:] == tb[: len(ta) - S]
            checked += 1
    assert checked > 0


def test_chunk_documents_rejects_coverage_gaps(spark):
    import pytest
    from s3_to_redshift_with_airflow_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="skip"):
        chunk_documents(docs, chunk_tokens=8, stride=9)
    with pytest.raises(ValueError, match="positive"):
        chunk_documents(docs, chunk_tokens=0, stride=1)


def test_token_budget_select_greedy_contract(spark):
    """Budget selection invariants at sf0.001: (1) spend never exceeds the
    budget, (2) the selection is score-downward-closed — every unselected
    doc scores ≤ every selected doc's score band, with only the single
    boundary band partially taken, (3) inside the boundary band the taken
    docs are a doc_id-ordered prefix under the running-sum rule."""
    from s3_to_redshift_with_airflow_spark.plans.training import (
        _TB_BUDGET,
        q_token_budget_select,
    )
    from .conftest import SF_SMOKE

    sel = q_token_budget_select(spark, SF_SMOKE).collect()
    assert sel, "selection must be non-empty at any sf"
    spent = sum(r["n_tok"] for r in sel)
    assert spent <= _TB_BUDGET
    # rebuild the per-doc frame the query scores, straight from the plan
    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.functions.text import tokens
    from s3_to_redshift_with_airflow_spark.plans.registry import _t

    (docs,) = _t(spark, SF_SMOKE, "documents")
    s = (
        docs.select("doc_id", tokens(F.col("text")).alias("tk"))
        .select(
            "doc_id",
            F.size("tk").cast("bigint").alias("n_tok"),
            F.expr("size(array_distinct(tk)) * 1000 div size(tk)")
            .cast("bigint")
            .alias("score"),
        )
        .filter(F.col("n_tok") > 0)
        .collect()
    )
    picked = {r["doc_id"] for r in sel}
    sel_scores = sorted({r["score"] for r in sel})
    unsel = [r for r in s if r["doc_id"] not in picked]
    if unsel and sel:
        min_sel = sel_scores[0]
        # no unselected doc strictly outscores the lowest selected band
        assert max(r["score"] for r in unsel) <= min_sel
        # bands above the boundary are taken WHOLE
        partial = {
            sc
            for sc in {r["score"] for r in s}
            if any(r["score"] == sc for r in unsel)
            and any(r["score"] == sc and r["doc_id"] in picked for r in s)
        }
        assert len(partial) <= 1
        if partial:
            (bscore,) = partial
            band = sorted(
                (r for r in s if r["score"] == bscore), key=lambda r: r["doc_id"]
            )
            run, expect = 0, set()
            rem = _TB_BUDGET - sum(
                r["n_tok"] for r in sel if r["score"] != bscore
            )
            # the taken part is exactly the running-sum prefix
            for r in band:
                if run + r["n_tok"] > rem:
                    break
                run += r["n_tok"]
                expect.add(r["doc_id"])
            got = {r["doc_id"] for r in sel if r["score"] == bscore}
            assert got == expect
