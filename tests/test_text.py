"""Text-analysis functions: tokenization edges, lang-ID tie-breaks, quality
bounds, fingerprint normalization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_to_redshift_with_airflow_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    punct_count,
    quality_score,
    token_count,
    token_shingles,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col(F.col("text")).alias("v")).collect()[0]["v"]


def test_token_count_collapses_whitespace(spark):
    assert _one(spark, "  a   b\t\nc ", token_count) == 3


def test_bpe_ish_splits_words_digits_symbols(spark):
    # "abc123!?" → abc | 123 | ! | ?  (4 pieces); plus "x" → 5
    assert _one(spark, "abc123!? x", bpe_ish_token_count) == 5


def test_punct_count_ascii(spark):
    assert _one(spark, "a,b.c!", punct_count) == 3


def test_fingerprint_normalization(spark):
    a = _one(spark, "Hello   World", fingerprint)
    b = _one(spark, "  hello world  ", fingerprint)
    c = _one(spark, "hello worlds", fingerprint)
    assert a == b and a != c


def test_lang_id_markers_and_tiebreak(spark):
    assert _one(spark, "the cat and the dog is here", lang_id) == "en"
    assert _one(spark, "der hund und die katze ist da", lang_id) == "de"
    assert _one(spark, "xyzzy qwerty", lang_id) == "und"
    # one marker each for de ("der") and en ("the") → tie → alphabetical: de
    assert _one(spark, "der the", lang_id) == "de"


def test_quality_score_bounds(spark):
    for text in ["", "!!!???", "the quick brown fox jumps over the lazy dog " * 20]:
        v = _one(spark, text, quality_score)
        assert 0.0 <= v <= 1.0
    long_clean = _one(spark, "the quick brown fox jumps over the lazy dog " * 20, quality_score)
    junk = _one(spark, "!!!???", quality_score)
    assert long_clean > junk


def test_token_shingles(spark):
    sh = _one(spark, "a b c d", lambda c: token_shingles(c, 3))
    assert sorted(sh) == ["a b c", "b c d"]
    assert _one(spark, "a b", lambda c: token_shingles(c, 3)) == []


def test_clean_text_masks_and_strips(spark):
    from s3_to_redshift_with_airflow_spark.functions.text import clean_text
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("<p>Hello   <b>world</b></p>",),
            ("mail me at bob.smith+x@example.co.uk today",),
            ("see https://example.com/a?b=1 and http://x.io",),
            ("  plain   text  ",),
        ],
        "text string",
    )
    got = [r["c"] for r in df.select(clean_text(F.col("text")).alias("c")).collect()]
    assert got == [
        "Hello world",
        "mail me at <EMAIL> today",
        "see <URL> and <URL>",
        "plain text",
    ]


def _winnow_pairs(spark, texts):
    """Run the winnow_fingerprint plan body over in-memory docs."""
    from pyspark.sql import Window
    from s3_to_redshift_with_airflow_spark.functions.text import (
        positional_token_shingles,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    base = df.select(
        "doc_id", positional_token_shingles(F.col("text"), 5).alias("grams")
    )
    ex = base.select(
        "doc_id", F.size("grams").alias("m"), F.posexplode("grams").alias("pos0", "gram")
    )
    w = Window.partitionBy("doc_id").orderBy("pos0").rowsBetween(0, 3)
    out = (
        ex.withColumn("fp", F.min(F.md5("gram")).over(w))
        .filter(F.col("pos0") + 1 <= F.greatest(F.col("m") - 3, F.lit(1)))
        .select("doc_id", "fp")
        .distinct()
    )
    return {
        did: {r.fp for r in grp}
        for did, grp in __import__("itertools").groupby(
            sorted(out.collect(), key=lambda r: r.doc_id), key=lambda r: r.doc_id
        )
    }


def test_winnowing_shared_run_guarantee(spark):
    """Winnowing's core theorem: two documents sharing a token run of
    length >= k + w - 1 (= 8 here) must share at least one fingerprint."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    fps = _winnow_pairs(
        spark,
        [
            f"completely different prefix {shared} and a different tail here",
            f"{shared} trailing words that do not match the other document",
        ],
    )
    assert fps[0] & fps[1], "shared 8-token run must produce a common fingerprint"


def test_winnowing_short_docs(spark):
    fps = _winnow_pairs(
        spark,
        [
            "only four tokens here",          # < k tokens -> no grams
            "five tokens right here now",     # exactly k -> one gram, one fp
            "six little tokens sit right here",  # k..k+w-2 -> exactly one window
        ],
    )
    assert 0 not in fps
    assert len(fps[1]) == 1
    assert len(fps[2]) == 1


def test_tfidf_topk_ranking_is_deterministic(spark):
    """tf*N/df ranks doc-specific repeated terms above ubiquitous ones."""
    from s3_to_redshift_with_airflow_spark.plans.registry import REGISTRY

    out = REGISTRY["tfidf_topk"].fn(spark, "/root/testdata/sf0.001").toPandas()
    assert set(out.columns) == {"doc_id", "term", "tf", "df", "score", "rnk"}
    # rank 1..3 per doc, no duplicates
    g = out.groupby("doc_id")["rnk"].apply(lambda s: sorted(s.tolist()))
    assert all(v == list(range(1, len(v) + 1)) for v in g)
    # score must equal tf*N/df exactly (single IEEE division)
    n_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert (out.score == (out.tf * n_docs).astype("float64") / out.df).all()


def test_pii_scrub_and_counts(spark):
    from s3_to_redshift_with_airflow_spark.functions.text import (
        pii_counts,
        pii_scrub,
    )

    rows = [
        (1, "mail a@b.io and c.d+x@e.org, call 555-123-4567, ssn 123-45-6789, ip 10.0.0.1"),
        (2, "no pii here at all"),
        (3, "1234-56-7890 is not an ssn and 999.999.999.999.5 hides 999.999.999.999"),
        (4, "two phones 111-222-3333 444-555-6666"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    c = pii_counts(F.col("text"))
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            pii_scrub(F.col("text")).alias("scrubbed"),
            *[v.alias(k) for k, v in c.items()],
        ).collect()
    }
    assert out[1]["email"] == 2 and out[1]["phone"] == 1
    assert out[1]["ssn"] == 1 and out[1]["ipv4"] == 1
    assert out[1]["scrubbed"] == (
        "mail <EMAIL> and <EMAIL>, call <PHONE>, ssn <SSN>, ip <IPV4>"
    )
    assert out[2]["scrubbed"] == rows[1][1]  # untouched, all counts 0
    assert sum(out[2][k] for k in ("email", "phone", "ssn", "ipv4")) == 0
    assert out[3]["ssn"] == 0  # leading digit breaks the word boundary
    assert out[4]["phone"] == 2


# --- BPE trainer vs pure-Python reference ----------------------------------


def _bpe_reference(texts, n_merges):
    import re
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.strip().lower()).split(" "):
            if w:
                words[w] += 1
    vocab = {tuple(w): f for w, f in words.items()}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += f
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, n))
        nxt = {}
        for sym, f in vocab.items():
            out = []
            for x in sym:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + f
        vocab = nxt
    return merges


def test_bpe_train_matches_reference(spark):
    from s3_to_redshift_with_airflow_spark.operators.bpe import bpe_train

    texts = [
        "low lower lowest newer newest wide wider widest",
        "low low lower new newer wide wide wide",
        "the newest widest lowest estimates",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_train(docs, n_merges=8)
    assert got == _bpe_reference(texts, 8)
    # merges must be learned greedily: counts non-increasing
    counts = [n for (_, _, _, n) in got]
    assert counts == sorted(counts, reverse=True)


def test_bpe_train_real_corpus_prefix(spark):
    """On the driver corpus the first merges must reproduce the reference
    algorithm too (guards the distributed pair-count weighting)."""
    from s3_to_redshift_with_airflow_spark.operators.bpe import bpe_train

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    assert bpe_train(docs, n_merges=4) == _bpe_reference(texts, 4)


def _bpe_apply_reference(texts, merges):
    import re

    out = []
    for t in texts:
        pieces = []
        for w in re.sub(r"\s+", " ", t.strip().lower()).split(" "):
            sym = list(w)
            for _, a, b, *_ in merges:
                nxt = []
                for x in sym:
                    if nxt and nxt[-1] == a and x == b:
                        nxt[-1] = a + b
                    else:
                        nxt.append(x)
                sym = nxt
            pieces.extend(sym)
        out.append(pieces)
    return out


def test_bpe_segment_matches_reference(spark):
    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.bpe import (
        bpe_segment,
        bpe_train,
    )

    texts = [
        "low lower lowest newer newest",
        "the lowest newest estimates are in",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=6)
    got = [
        r["p"]
        for r in docs.orderBy("doc_id")
        .select(bpe_segment(F.col("text"), merges).alias("p"))
        .collect()
    ]
    assert got == _bpe_apply_reference(texts, merges)
    # segmentation must reconstruct the original words exactly
    joined = ["".join(p) for p in got]
    expected = ["".join(t.split()) for t in texts]
    assert joined == expected


def test_weighted_sample_favors_heavy_docs_and_is_stable(spark):
    """Priority sampling: a document with overwhelming weight is selected;
    the draw is invariant to partitioning (pure function of key+weight)."""
    from s3_to_redshift_with_airflow_spark.plans import query_map
    import tempfile, os

    rows = [(i, "x" * 3, "en", "s0", 10) for i in range(50)]
    rows.append((999, "y", "en", "s0", 10**9))  # one giant doc
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    with tempfile.TemporaryDirectory() as d:
        df.repartition(7).write.parquet(os.path.join(d, "documents.parquet"))
        out = query_map()["weighted_sample"](spark, d).collect()
        ids = {r["doc_id"] for r in out}
        assert len(out) == 5 and 999 in ids
        out2 = query_map()["weighted_sample"](spark, d).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_char_entropy_fixed_point_is_exact_and_gates_spam(spark):
    """char_entropy_filter: N*H in fixed point is EXACT for power-of-two
    counts ('aabb' -> exactly 1.0 bit == 65536), single-symbol spam is 0
    and labeled 'low', ordinary prose clears the 3.0-bit gate."""
    from s3_to_redshift_with_airflow_spark.plans import query_map
    import tempfile, os

    rows = [
        (1, "aabb", "en", "s0", 4),
        (2, "a" * 40, "en", "s0", 40),
        (3, "The quick brown fox jumps over the lazy dog; pack my box "
            "with five dozen liquor jugs.", "en", "s0", 86),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["doc_id"]: r
            for r in query_map()["char_entropy_filter"](spark, d).collect()
        }
    assert out[1]["entropy_fp"] == 65536 and out[1]["label"] == "low"
    assert out[2]["entropy_fp"] == 0 and out[2]["label"] == "low"
    assert out[2]["n_alphabet"] == 1
    assert out[3]["entropy_fp"] > 3 * 65536 and out[3]["label"] == "ok"


def test_phrase_search_requires_adjacency_and_order(spark):
    """phrase_search: 'table hash' matches only ADJACENT in-order tokens —
    not the reversed bigram, not the gapped pair — and counts every
    occurrence (including overlapping term runs)."""
    from s3_to_redshift_with_airflow_spark.plans import query_map
    import tempfile, os

    rows = [
        (1, "table hash join table hash", "en", "s0", 26),  # 2 matches, pos 0
        (2, "hash table", "en", "s0", 10),                  # reversed: no
        (3, "table big hash", "en", "s0", 14),              # gapped: no
        (4, "a table hash b", "en", "s0", 14),              # 1 match, pos 1
        (5, "table table hash", "en", "s0", 16),            # 1 match, pos 1
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["doc_id"]: r for r in query_map()["phrase_search"](spark, d).collect()
        }
    assert set(out) == {1, 4, 5}
    assert out[1]["n_matches"] == 2 and out[1]["first_pos"] == 0
    assert out[4]["n_matches"] == 1 and out[4]["first_pos"] == 1
    assert out[5]["n_matches"] == 1 and out[5]["first_pos"] == 1
    assert out[1]["rnk"] == 1


def test_bm25_semantics_saturation_length_and_idf(spark):
    """bm25_search: (a) OR semantics — a doc matching one term still
    scores; (b) length normalization — same tf in a longer doc scores
    LOWER; (c) tf saturation — doubling tf raises the score by less than
    2x; (d) idf — a rarer term outweighs a common one at equal tf/len."""
    from s3_to_redshift_with_airflow_spark.plans import query_map
    import tempfile, os

    filler = " ".join(f"f{i}" for i in range(40))
    rows = [
        (1, "vector alpha beta gamma delta", "en", "s0", 29),      # tf=1, short
        (2, "vector " + filler, "en", "s0", 200),                  # tf=1, long
        (3, "vector vector alpha beta gamma", "en", "s0", 30),     # tf=2
        # 'merge' appears in only this doc (rarer than vector -> higher idf)
        (4, "merge alpha beta gamma delta", "en", "s0", 28),
        (5, "plain filler text only", "en", "s0", 22),             # no match
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["doc_id"]: r for r in query_map()["bm25_search"](spark, d).collect()
        }
    assert set(out) == {1, 2, 3, 4}  # OR semantics; doc 5 never scores
    assert all(r["n_terms"] == 1 for r in out.values())
    assert out[1]["score"] > out[2]["score"]          # longer doc, same tf
    assert out[3]["score"] > out[1]["score"]          # higher tf helps...
    assert out[3]["score"] < 2 * out[1]["score"]      # ...sub-linearly (k1)
    assert out[4]["score"] > out[1]["score"]          # rarer term: df=1 vs 3


def test_bm25_index_survives_raw_document_deletion(spark, tmp_path):
    """Build-once/serve-many: persist the inverted index, DELETE the raw
    documents, and the stored-index search must return row-for-row what
    the live bm25_search computed while the text still existed."""
    import shutil

    from s3_to_redshift_with_airflow_spark.operators.retrieval import (
        bm25_index_build,
        bm25_index_search,
        read_bm25_index,
        write_bm25_index,
    )
    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    from .conftest import SF_SMOKE

    want = [tuple(r) for r in REGISTRY["bm25_search"].fn(spark, SF_SMOKE).collect()]

    raw = str(tmp_path / "docs_raw")
    spark.read.parquet(f"{SF_SMOKE}/documents.parquet").write.parquet(raw)
    idx = str(tmp_path / "bm25_idx")
    write_bm25_index(*bm25_index_build(spark.read.parquet(raw)), idx)
    shutil.rmtree(raw)  # the raw text is gone

    postings, doclens, stats = read_bm25_index(spark, idx)
    got = [
        tuple(r)
        for r in bm25_index_search(
            postings, doclens, stats, ["vector", "merge", "window"]
        ).collect()
    ]
    assert got == want and len(got) == 20


def test_bm25_index_append_equals_rebuild(spark):
    """Appending a delta to a stored index must reproduce the full
    rebuild's TABLES bit-for-bit (not just the same top-k): postings
    multiset, doclens, and the floored stats row all equal."""
    from pyspark.sql import functions as F

    from s3_to_redshift_with_airflow_spark.operators.retrieval import (
        bm25_index_append,
        bm25_index_build,
    )

    from .conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    base = docs.filter(F.col("doc_id") % 4 != 1)
    new = docs.filter(F.col("doc_id") % 4 == 1)

    p_full, l_full, s_full = bm25_index_build(docs)
    p_base, l_base, _ = bm25_index_build(base)
    p_app, l_app, s_app = bm25_index_append(p_base, l_base, new)

    key = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert key(p_app) == key(p_full)
    assert key(l_app) == key(l_full)
    assert key(s_app) == key(s_full)


def test_bm25_postings_scan_pushes_term_filter(spark, tmp_path):
    """The serving path's whole point: the term probe must reach the
    parquet scan as a pushed filter, so the sorted-by-term layout can
    prune row groups."""
    from s3_to_redshift_with_airflow_spark.operators.retrieval import (
        bm25_index_build,
        bm25_index_search,
        read_bm25_index,
        write_bm25_index,
    )

    from .conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    idx = str(tmp_path / "idx")
    write_bm25_index(*bm25_index_build(docs), idx)
    out = bm25_index_search(*read_bm25_index(spark, idx), ["vector", "merge"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(term" in plan, plan


def test_zipf_fit_separates_zipfian_from_flat(spark, tmp_path):
    """A planted Zipfian corpus (freq ∝ 1/rank) must fit slope ≈ −1; a
    flat corpus (all tokens equally frequent) must fit slope ≈ 0 — the
    synthetic-corpus detector doing its one job."""
    import os

    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    def corpus(d, word_counts):
        words = []
        for i, c in enumerate(word_counts):
            words += [f"w{i:03d}"] * c
        docs = [
            (j, " ".join(words[j::10]), "en", "s", 1)
            for j in range(10)
        ]
        spark.createDataFrame(
            docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).write.parquet(os.path.join(d, "documents.parquet"))

    zipf_dir = str(tmp_path / "zipf")
    flat_dir = str(tmp_path / "flat")
    os.makedirs(zipf_dir)
    os.makedirs(flat_dir)
    corpus(zipf_dir, [1200 // r for r in range(1, 41)])   # freq ~ 1/rank
    corpus(flat_dir, [50] * 40)                            # flat

    fn = REGISTRY["zipf_fit"].fn
    z = fn(spark, zipf_dir).collect()[0]
    f = fn(spark, flat_dir).collect()[0]
    assert -1.15 < z.zipf_slope < -0.85, z.zipf_slope
    assert abs(f.zipf_slope) < 0.05, f.zipf_slope
    assert z.var_num > 0 and f.var_num > 0


def test_lang_confusion_is_consistent_with_lang_id(spark):
    """The confusion matrix must tally exactly with per-doc predictions:
    cell sums equal doc counts, n_correct nonzero only on the diagonal,
    and per-cell n_correct == n there."""
    from s3_to_redshift_with_airflow_spark.plans import REGISTRY

    from .conftest import SF_SMOKE

    cells = REGISTRY["lang_confusion"].fn(spark, SF_SMOKE).collect()
    preds = REGISTRY["lang_id"].fn(spark, SF_SMOKE).collect()
    assert sum(c.n for c in cells) == len(preds)
    for c in cells:
        if c.true_lang == c.pred_lang:
            assert c.n_correct == c.n
        else:
            assert c.n_correct == 0


def test_bm25_batch_serve_matches_single_query_and_pushes_terms(spark, tmp_path):
    """bm25_index_search_batch: (a) a batch containing one query ranks
    bit-identically to bm25_index_search run alone with the same terms —
    batching must not move a score or a rank; (b) the bounded term set is
    pushed as a literal In(term, ...) filter so the sorted layout can
    prune row groups (the semi-join form can't reach parquet stats);
    (c) past push_terms_limit it degrades to the semi-join and STILL
    returns the identical ranking."""
    from s3_to_redshift_with_airflow_spark.operators.retrieval import (
        bm25_index_build,
        bm25_index_search,
        bm25_index_search_batch,
        read_bm25_index,
        write_bm25_index,
    )

    from .conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    idx = str(tmp_path / "idx")
    write_bm25_index(*bm25_index_build(docs), idx)
    postings, doclens, stats = read_bm25_index(spark, idx)
    terms = ["vector", "merge", "window"]
    single = [
        (r["doc_id"], r["score"], r["n_terms"], r["rnk"])
        for r in bm25_index_search(postings, doclens, stats, terms).collect()
    ]
    qt = spark.createDataFrame([(7, t) for t in terms], "query_id long, term string")
    batch_df = bm25_index_search_batch(postings, doclens, stats, qt)
    plan = batch_df._jdf.queryExecution().executedPlan().toString()
    assert "In(term" in plan, plan  # pushed literal filter
    batched = [
        (r["doc_id"], r["score"], r["n_terms"], r["rnk"])
        for r in batch_df.orderBy("rnk").collect()
    ]
    assert batched == single
    # degraded semi-join path (limit 0 forces it): same ranking
    fallback = bm25_index_search_batch(
        postings, doclens, stats, qt, push_terms_limit=0
    )
    fb = [
        (r["doc_id"], r["score"], r["n_terms"], r["rnk"])
        for r in fallback.orderBy("rnk").collect()
    ]
    assert fb == single
