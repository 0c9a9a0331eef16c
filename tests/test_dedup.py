"""Dedup family: exact fingerprint, MinHash-LSH recall vs brute force,
SimHash properties — on synthetic docs with planted near-duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_to_redshift_with_airflow_spark.operators.dedup import (
    exact_dedup_by_fingerprint,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_neardup_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away into "
    "the deep green forest while the sun sets slowly behind tall mountains"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1 (modulo nothing)
        (3, "  " + BASE.upper() + "  "),  # normalized dup of 1
        (4, BASE.replace("dog", "cat")),  # near dup (1 token changed)
        (5, "completely different text about query engines and shuffles "
            "with partitions and executors running large aggregations"),
        (6, "unrelated short snippet"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_normalized(docs):
    out = exact_dedup_by_fingerprint(docs)
    groups = {r["canonical_id"]: r["n_copies"] for r in out.collect()}
    assert groups[1] == 3  # docs 1,2,3 share a fingerprint; canonical = min id
    assert groups[4] == 1 and groups[5] == 1 and groups[6] == 1


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 3)] == 1.0
    assert 0.5 <= pairs[(1, 4)] < 1.0  # one-token change stays similar
    assert (1, 5) not in pairs and (5, 6) not in pairs


def test_minhash_matches_bruteforce(docs):
    exact = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, threshold=0.8).collect()}
    assert lsh == exact  # precision exact by construction; recall ~1 at j>=0.8


def test_minhash_matches_bruteforce_real_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, threshold=0.8).collect()}
    assert lsh == exact


def test_simhash_identical_docs_equal_hash(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert sigs[1] == sigs[2] == sigs[3]
    assert sigs[1] != sigs[5]


def test_simhash_neardup_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_neardup_pairs(docs, max_hamming=3).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0
    assert (1, 5) not in pairs


def test_chunk_dedup_semantics(spark):
    from s3_to_redshift_with_airflow_spark.operators.dedup import chunk_dedup

    # 4-token chunks: doc 1 = [A B], doc 2 = [B C], doc 3 = [A], doc 4 = [D]
    a = "alpha beta gamma delta"
    b = "epsilon zeta eta theta"
    c = "iota kappa lambda mu"
    d = "nu xi omicron pi"
    rows = [
        (1, f"{a} {b}"),
        (2, f"{b} {c}"),  # chunk B already seen in doc 1 pos 1
        (3, a),           # chunk A already seen in doc 1 pos 0
        (4, d),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in chunk_dedup(docs, chunk_tokens=4).collect()
    }
    assert len(out) == 4  # every doc present, even fully-deduped ones
    assert out[1]["clean_text"] == f"{a} {b}"  # first occurrences survive
    assert out[2]["clean_text"] == c and out[2]["dropped_chunks"] == 1
    assert out[3]["clean_text"] == "" and out[3]["kept_chunks"] == 0
    assert out[4]["clean_text"] == d and out[4]["dropped_chunks"] == 0


def test_chunk_dedup_within_doc_repeat(spark):
    from s3_to_redshift_with_airflow_spark.operators.dedup import chunk_dedup

    # the same 2-token chunk repeated inside ONE document: first pos wins
    docs = spark.createDataFrame(
        [(7, "red blue red blue green white")], "doc_id long, text string"
    )
    row = chunk_dedup(docs, chunk_tokens=2).collect()[0]
    assert row["clean_text"] == "red blue green white"
    assert row["kept_chunks"] == 2 and row["dropped_chunks"] == 1


def test_chunk_dedup_shuffles_hash_not_text(spark):
    """Scale guard: the survivor-selection exchange must key on the 128-bit
    segment hash (__ck1, __ck2), never the raw segment text — at 100 TB a
    text-keyed shuffle moves full document bytes as keys."""
    from s3_to_redshift_with_airflow_spark.operators.dedup import chunk_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        chunk_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(__ck1" in plan
    assert "hashpartitioning(chunk" not in plan


def test_leakage_safe_split_never_straddles_pairs(spark):
    """No near-dup pair may have one side in train and one in eval — the
    invariant that distinguishes this split from a per-doc hash split."""
    from s3_to_redshift_with_airflow_spark.plans import query_map

    sf = "/root/testdata/sf0.01"
    split = query_map()["leakage_safe_split"](spark, sf)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = minhash_lsh_pairs(docs, num_hashes=64, n_bands=32, threshold=0.8)
    s = {r["doc_id"]: r["split"] for r in split.collect()}
    straddlers = [
        (r["id_a"], r["id_b"])
        for r in pairs.collect()
        if s[r["id_a"]] != s[r["id_b"]]
    ]
    assert not straddlers
    # ~1/8 eval by hash membership; wide band guards the corpus regen case
    frac = sum(1 for v in s.values() if v == "eval") / len(s)
    assert 0.05 < frac < 0.22, frac


def test_gopher_rules_semantics(spark):
    from s3_to_redshift_with_airflow_spark.functions.text import gopher_rules

    rows = [
        (1, "the cat and the dog ran over the tall green hill yesterday"),
        (2, "word " * 3),                     # too few tokens
        (3, "a b c d e f g h i j k l"),      # mean word length < 3
        (4, "the " * 20),                    # distinct fraction 1/20
        (5, "11 22 33 44 55 66 77 88 99 00 12 34"),  # no alphabetic tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    rules = gopher_rules(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id", *[v.alias(k) for k, v in rules.items()]
        ).collect()
    }
    assert all(out[1][k] for k in out[1].asDict() if k.startswith("r_"))
    assert not out[2]["r_word_count"]
    assert not out[3]["r_mean_word_len"]
    assert not out[4]["r_distinct_fraction"]
    assert not out[5]["r_alpha_fraction"] and not out[5]["r_stopwords"]


def test_curation_funnel_is_a_monotone_funnel(spark):
    """Each curation stage only removes documents, and the stage counts
    agree with the standalone operators run independently."""
    import functools

    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.functions.text import gopher_rules
    from s3_to_redshift_with_airflow_spark.plans import query_map

    row = query_map()["curation_funnel"](spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_raw"] >= row["n_quality"] >= row["n_exact"] >= row["n_curated"] > 0
    assert row["total_tokens"] > 0
    assert row["n_chunks"] >= row["n_curated"]  # every doc yields ≥1 chunk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert row["n_raw"] == docs.count()
    rules = gopher_rules(F.col("text"))
    passes = functools.reduce(lambda a, b: a & b, rules.values())
    assert row["n_quality"] == docs.filter(passes).count()


def test_intra_doc_dedup_removes_repeated_segments(spark):
    """A document whose second half repeats its first half keeps exactly the
    first occurrence; a non-repetitive document is unchanged."""
    import os
    import tempfile

    from s3_to_redshift_with_airflow_spark.plans import query_map

    rep = " ".join(str(i % 10) for i in range(20))  # two identical 10-tok segs
    uniq = " ".join(str(i) for i in range(20))      # two distinct segs
    df = spark.createDataFrame(
        [(1, rep, "en", "s0", len(rep)), (2, uniq, "en", "s0", len(uniq))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["doc_id"]: r for r in query_map()["intra_doc_dedup"](spark, d).collect()}
    assert out[1]["n_segments"] == 2 and out[1]["kept_segments"] == 1
    assert out[1]["clean_text"] == " ".join(str(i % 10) for i in range(10))
    assert out[2]["n_segments"] == 2 and out[2]["kept_segments"] == 2
    assert out[2]["clean_text"] == uniq


def test_repeated_window_stats_detects_long_clones(spark):
    """A verbatim clone of >= w + s - 1 tokens must contain a fully
    repeated window (recall 1 on long clones); unique docs score 0; docs
    shorter than w have no windows and are excluded."""
    from s3_to_redshift_with_airflow_spark.operators.dedup import (
        repeated_window_stats,
    )

    clone = " ".join(f"t{i}" for i in range(10))  # exactly w tokens
    rows = [
        (1, clone + " aaa bbb"),         # clone at offset 0
        (2, "xxx yyy zzz " + clone),     # clone at offset 3 (different phase)
        (3, " ".join(f"u{i}" for i in range(16))),  # unique, 0 repeated
        (4, "too short"),  # < 10 tokens -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_windows"], r["n_repeated"])
        for r in repeated_window_stats(df, window_tokens=10).collect()
    }
    assert 4 not in out
    assert out[3] == (7, 0)
    # alignment-independent: the w-token clone is caught in BOTH docs
    assert out[1] == (3, 1) and out[2] == (4, 1)
    for kwargs in ({"stride": 0}, {"stride": 11}, {"window_tokens": 0}):
        try:
            repeated_window_stats(df, **{"window_tokens": 10, **kwargs})
            raise AssertionError(f"accepted {kwargs}")
        except ValueError:
            pass


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc fully quoted inside a much longer one: containment
    C(A,B)=1.0 while Jaccard is diluted below any useful threshold —
    the asymmetric case that motivates the operator. The relation is
    directional: only (quote → container) emits at t=0.8, never the
    reverse; unrelated docs emit nothing; brute-force parity holds."""
    from s3_to_redshift_with_airflow_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
        release_shingle_cache,
    )

    quote = " ".join(f"q{i}" for i in range(12))
    filler = " ".join(f"f{i}" for i in range(120))
    rows = [
        (1, quote),                      # the contained quote
        (2, filler + " " + quote),       # the container
        (3, " ".join(f"z{i}" for i in range(30))),  # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["n_a"], r["containment"])
        for r in containment_pairs(df, threshold=0.8).collect()
    }
    assert set(got) == {(1, 2)}  # directional: quote inside container only
    inter, n_a, cont = got[(1, 2)]
    assert inter == n_a == 10 and cont == 1.0  # 12 tokens -> 10 shingles
    # symmetric Jaccard is blind to it at the same threshold (and far below)
    jac = ngram_jaccard_pairs(df, threshold=0.3).collect()
    assert jac == []
    # brute-force parity on a mutual near-dup: both directions emit
    dup_rows = [(1, quote), (2, quote + " extra tok"), (3, filler)]
    df2 = spark.createDataFrame(dup_rows, "doc_id long, text string")
    both = {
        (r["id_a"], r["id_b"]) for r in containment_pairs(df2, threshold=0.8).collect()
    }
    assert both == {(1, 2), (2, 1)}
    release_shingle_cache()


def test_containment_integer_threshold_boundary_and_max_df(spark):
    """ADVICE r5: the prefix length must use exact integer ceil. A has 10
    shingles, exactly 7 shared with B → C(A,B) = 7/10 at threshold 0.7.
    Under double arithmetic ceil(0.7·10) = ceil(7.000000000000001) = 8
    shortens the prefix to 3 — exactly A's three unshared (df=1, hence
    prefix-first) shingles — so the boundary pair was pruned before
    verification. The exact-integer prefix (ceil(7·n/10) via div) keeps
    the 4th witness slot and the pair emits. Also pins the max_df knob:
    capping df at 1 drops the shared (df=2) shingles from candidate
    generation, so the pair is missed (the documented recall trade) while
    nothing unverified ever emits."""
    from s3_to_redshift_with_airflow_spark.operators.dedup import (
        containment_pairs,
        release_shingle_cache,
    )

    a_toks = [f"a{i}" for i in range(1, 13)]  # a1..a12 -> 10 shingles
    b_toks = [f"b{i}" for i in range(30)] + a_toks[3:]  # shares a4..a12 -> 7
    rows = [(1, " ".join(a_toks)), (2, " ".join(b_toks))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["n_a"])
        for r in containment_pairs(df, threshold=0.7).collect()
    }
    assert got == {(1, 2): (7, 10)}  # the exact-boundary pair survives
    # max_df=1 drops the df=2 shared shingles from candidate generation:
    # the pair is missed (documented recall consequence), never wrong.
    capped = containment_pairs(df, threshold=0.7, max_df=1).collect()
    assert capped == []
    # a generous cap changes nothing
    loose = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(df, threshold=0.7, max_df=10_000).collect()
    }
    assert loose == {(1, 2)}
    release_shingle_cache()


def test_repeated_span_report_semantics(spark):
    """Lee et al. span semantics: multiplicity counts (every occurrence
    of a >=2x span is repeated), within-doc repeats count, short docs
    report zero windows, unique text reports zero repeats."""
    from s3_to_redshift_with_airflow_spark.operators.dedup import (
        repeated_span_report,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # 9 toks
            (2, "intro text the quick brown fox jumps over the lazy dog"),
            (3, "totally unique words appear in this document only here"),
            (4, "tiny doc"),  # shorter than the window
            (5, "loop loop loop loop loop loop loop loop loop loop"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_repeated"], r["dup_ratio_bp"])
        for r in repeated_span_report(docs, w=8).collect()
    }
    # doc 1: 2 windows, both also occur in doc 2 -> fully repeated
    assert got[1] == (2, 2, 10000)
    # doc 2: 4 windows, the last 2 are doc 1's -> half repeated
    assert got[2] == (4, 2, 5000)
    assert got[3] == (2, 0, 0)  # unique text
    assert got[4] == (0, 0, 0)  # too short for any window
    # doc 5: 3 windows of identical text -> within-doc repetition counts
    assert got[5] == (3, 3, 10000)


def test_repeated_span_trim_keep_one_semantics(spark):
    """VERDICT r9 #2: the trim transform's keep-one rule — a planted
    boilerplate block survives exactly once corpus-wide (in the lowest
    (doc_id, pos) carrier), unique text is untouched, short docs are
    untouched, and a fully-duplicated document trims to empty."""
    from s3_to_redshift_with_airflow_spark.operators.dedup import (
        repeated_span_trim,
    )

    boiler = "all rights reserved unauthorized reproduction of this text is prohibited"  # 10 toks
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma delta {boiler}"),
            (2, f"epsilon zeta {boiler} eta theta"),
            (3, f"{boiler}"),
            (4, "totally unique words appear in this document only here"),
            (5, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in repeated_span_trim(docs, w=8).collect()
    }
    # the block survives exactly once across the corpus: doc 1 is the
    # lowest (doc_id, pos) carrier of every repeated window
    assert sum(got[d][2].count(boiler) for d in got) == 1
    assert got[1] == (14, 0, f"alpha beta gamma delta {boiler}")
    # doc 2: the boilerplate's windows repeat doc 1's -> its tokens go;
    # the unique prefix/suffix stay (suffix tokens are covered only if a
    # dup window reaches them — 'eta theta' sit inside the last dup
    # window's w-token footprint, so check against the operator's rule:
    # a token is dropped iff covered by a non-first repeated window)
    assert got[2][2].startswith("epsilon zeta")
    assert boiler not in got[2][2]
    assert got[2][0] == 14
    # doc 3 is the boilerplate alone: every window repeats doc 1's copy
    # -> trims to empty
    assert got[3] == (10, 10, "")
    assert got[4] == (9, 0, "totally unique words appear in this document only here")
    assert got[5] == (2, 0, "tiny doc")


def test_repeated_span_trim_within_doc_keeps_first_occurrence(spark):
    """Within-document repetition: the first copy of a repeated block
    stays, the second copy's tokens are removed."""
    from s3_to_redshift_with_airflow_spark.operators.dedup import (
        repeated_span_trim,
    )

    block = "one two three four five six seven eight"  # exactly w=8 tokens
    docs = spark.createDataFrame(
        [(1, f"{block} middle filler words {block}")],
        "doc_id long, text string",
    )
    (row,) = repeated_span_trim(docs, w=8).collect()
    assert row["clean_text"].count(block) == 1
    assert row["clean_text"].startswith(block)
    assert row["n_removed"] == 8


def test_benchmark_contamination_semantics(spark):
    """The decontamination gate: a training doc sharing a full w-token
    window with the benchmark is flagged with the right window count;
    partial (< w token) overlap is clean; short docs are clean by
    definition; benchmark-internal repetition doesn't inflate counts."""
    from s3_to_redshift_with_airflow_spark.operators.dedup import (
        benchmark_contamination_report,
    )

    eval_q = "what is the capital of france answer paris obviously"  # 9 toks
    bench = spark.createDataFrame(
        [(1, eval_q), (2, eval_q)],  # internal repetition: still a SET
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # contains the full eval question -> its 2 windows both hit
            (10, f"intro text {eval_q} outro"),
            # shares only 7 tokens -> no full window -> clean
            (11, "what is the capital of france answer berlin maybe"),
            (12, "completely unrelated text about something else entirely here"),
            (13, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_contaminated"], r["contaminated"])
        for r in benchmark_contamination_report(docs, bench, w=8).collect()
    }
    assert got[10] == (5, 2, True)
    assert got[11] == (2, 0, False)
    assert got[12] == (1, 0, False)
    assert got[13] == (0, 0, False)


def test_benchmark_contamination_probe_is_broadcast(spark):
    """Scale shape: the benchmark hash set must reach the span stream as
    a BROADCAST (the corpus probe stays map-side; the only exchange
    before the rollup is the benchmark's own distinct)."""
    from s3_to_redshift_with_airflow_spark.operators.dedup import (
        benchmark_contamination_report,
    )

    docs = spark.createDataFrame(
        [(i, f"some words repeated here for document {i} padding tokens")
         for i in range(20)],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id % 5 = 0")
    plan = benchmark_contamination_report(
        docs.filter("doc_id % 5 != 0"), bench, w=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "BroadcastHashJoin" in plan
