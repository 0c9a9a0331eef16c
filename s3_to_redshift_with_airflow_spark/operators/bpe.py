"""Distributed BPE tokenizer training (Sennrich et al. 2016 — the public
byte-pair-encoding algorithm every modern LLM tokenizer descends from).

The reference has no tokenizer surface; this extends the engine's
training-data family (BASELINE.json north-star ops) with the one step that
must see the WHOLE corpus: learning the merge table. Inference-side helpers
(`bpe_ish_token_count`, `bpe_merge_candidates`) already exist; this operator
closes the loop by computing the ranked merge list itself.

Spark-first design — the corpus is touched ONCE:

  1. one pass builds the word-frequency table (explode tokens → groupBy):
     all later work runs on |vocab| rows, not |corpus| rows — the classic
     BPE trick, and the reason tokenizer training is feasible at 100 TB
     (the vocab table is millions of rows regardless of corpus size);
  2. each merge iteration is one adjacent-pair count over the vocab table
     (explode pairs → groupBy(pair) → weighted sum) + a 1-row argmax
     collect (sanctioned O(1) driver read — the merge decision is
     inherently sequential), then a codegen'd left-to-right fold rewrites
     the symbol arrays with the winning pair as literals;
  3. `localCheckpoint` truncates the growing plan per iteration (same
     discipline as operators/graph.py).

Determinism: argmax ties break by (count desc, left asc, right asc), so the
merge table is a pure function of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _adjacent_pairs(sym_col: str) -> "F.Column":
    """Array of structs (a, b) for each adjacent symbol pair."""
    s = F.col(sym_col)
    return F.when(F.size(s) < 2, F.array().cast("array<struct<a:string,b:string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(s) - 1),
            lambda i: F.struct(
                F.element_at(s, i).alias("a"), F.element_at(s, i + 1).alias("b")
            ),
        )
    )


def _merge_pair_expr(sym: "F.Column", a: str, b: str) -> "F.Column":
    """Left-to-right single-pass merge of adjacent (a, b) into a+b.

    Fold building the new array: append x unless the accumulator's last
    element is `a` and x is `b` — then replace the last element with the
    merged symbol. Greedy-leftmost matches the reference algorithm: a
    just-merged element no longer equals `a`, so overlapping occurrences
    ("aaa" under (a,a)) merge exactly once."""
    merged = a + b
    empty = F.array().cast("array<string>")
    return F.aggregate(
        sym,
        empty,
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _merge_pair(sym_col: str, a: str, b: str) -> "F.Column":
    return _merge_pair_expr(F.col(sym_col), a, b)


def bpe_segment(c: "F.Column", merges: list[tuple]) -> "F.Column":
    """Segment text under a LEARNED merge list (the apply side of BPE):
    whitespace words → character symbols → the merge folds chained in rank
    order, flattened back to one token array per document.

    The merge list is inlined as literals, so the whole segmentation is one
    codegen'd expression — no Python, no joins; plan depth grows linearly
    with len(merges) (fine for the short lists the registry trains; a
    production tokenizer with 50k merges would apply via a broadcast
    word→pieces dictionary built by segmenting the VOCAB once instead)."""
    from ..functions.text import tokens

    def seg(word):
        sym = F.split(word, "")
        for m in merges:
            _, a, b = m[0], m[1], m[2]
            sym = _merge_pair_expr(sym, a, b)
        return sym

    # drop empty words first (an all-whitespace document normalizes to [""],
    # which would otherwise contribute a spurious empty piece)
    words = F.filter(tokens(c), lambda t: t != "")
    return F.flatten(F.transform(words, seg))


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
) -> list[tuple[int, str, str, int]]:
    """Learn `n_merges` BPE merges over the corpus; returns
    [(rank, left, right, pair_count), ...] in merge order.

    Words are whitespace tokens of the normalized text; initial symbols are
    single characters (no end-of-word marker — stated simplification, the
    plan is identical with one). Stops early when no adjacent pair is left.
    """
    from ..functions.text import tokens

    vocab = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.split(F.col("word"), "").alias("sym"), "freq")
        .localCheckpoint()
    )

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            vocab.select(F.explode(_adjacent_pairs("sym")).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merges.append((rank, a, b, int(n)))
        if rank < n_merges - 1:  # the last merge's rewrite is never read
            vocab = vocab.select(
                _merge_pair("sym", a, b).alias("sym"), "freq"
            ).localCheckpoint()
    return merges


def bpe_train_df(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
) -> DataFrame:
    """`bpe_train` as a DataFrame (rank, left, right, merged, pair_count) —
    the registry-facing shape."""
    spark = docs.sparkSession
    rows = [
        (rank, a, b, a + b, n) for rank, a, b, n in bpe_train(docs, text_col, n_merges)
    ]
    return spark.createDataFrame(
        rows, "rank long, left string, right string, merged string, pair_count long"
    )
