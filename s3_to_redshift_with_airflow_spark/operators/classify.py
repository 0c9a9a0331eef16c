"""Hashed linear text classifier — the fastText-style quality gate shape.

Production pretraining pipelines gate documents with a cheap linear
classifier over hashed bag-of-words features (fastText supervised models:
Joulin et al. 2016, arXiv:1607.01759 — the filter used by CCNet and the
LLaMA/RedPajama data recipes). The engine-relevant part is the EXECUTION
shape, which this reproduces exactly Spark-first:

  * tokenize (the shared whitespace tokenizer, functions/text.tokens);
  * hash each token into one of `n_buckets` weight slots — the hashing
    trick (Weinberger et al., ICML'09), so the model is a fixed-size
    table no matter the vocabulary;
  * BROADCAST-join the tiny weight table to the exploded token stream
    (the table is n_buckets rows — KBs to a few MB — so the corpus-side
    stream never shuffles for the lookup);
  * one groupBy(doc) integer sum = the margin; sign of the margin is the
    label. Margins are INTEGER (weights are integer-quantized, the usual
    deployment trick) so the aggregation is exact and order-independent —
    bit-identical across engines and partitionings, which is what lets a
    CLASSIFIER carry an exact DuckDB value oracle.

Weights: pass a trained `(bucket: bigint, weight: bigint)` DataFrame. When
none is given, a deterministic md5-derived stand-in table is generated
(the container ships no trained model; the stand-in exercises the identical
plan and is reproducible in SQL — same honest-stub posture as
operators/multimodal.py's fake decode).

Scale shape (100 TB): explode is JVM-side; the weight join is broadcast;
the only shuffle is the final groupBy(doc_id) of pre-aggregated partial
sums. No Python touches the hot path.

Reference parity: the reference engine has no classifier — this is
BASELINE.json training-pipeline extension surface (quality gating).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def _md5_int60(col) -> F.Column:
    """First 15 md5 hex nibbles as a non-negative 60-bit bigint — the
    engine-portable hash used across the registry (DuckDB twin:
    ('0x' || substr(md5(x), 1, 15))::UBIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def standin_weights(
    spark, n_buckets: int = 4096, seed: int = 7, w_max: int = 500
) -> DataFrame:
    """Deterministic stand-in weight table (bucket, weight) with integer
    weights in [-w_max, w_max], derived from md5 so the oracle can rebuild
    it bit-for-bit. Swap in a trained table with the same schema for real
    gating — the plan shape is identical."""
    span = 2 * w_max + 1
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (
            _md5_int60(F.concat(F.lit(f"w:{seed}:"), F.col("id").cast("string")))
            % span
            - w_max
        ).alias("weight"),
    )


def log2_fp_sql(x: str, scale: int = 65536, dialect: str = "spark") -> str:
    """Fixed-point piecewise-linear log2 as a SQL expression string, exact
    integer arithmetic on both engines — the primitive that lets a trained
    Naive-Bayes-style weight table carry a bit-exact value oracle.

    For bigint x ≥ 1: with m = floor(log2(x)) = length(bin(x)) − 1 and
    p = 2^m, returns m·scale + ((x − p)·scale) div p — the integer part of
    log2 exactly, plus a linear interpolation within the octave (max error
    ~0.086 bits, irrelevant for ranking log-odds). Every operand is a
    non-negative bigint, so Spark's truncating `div` and DuckDB's flooring
    `//` agree bit-for-bit (same portability rule as the md5 hash trick).
    Overflow: (x − p)·scale < x·scale, safe while x < 2^63/scale (~1.4e14
    at the default scale) — far beyond any token-count this sees.
    """
    m = f"(length(bin({x})) - 1)"
    if dialect == "spark":
        p = f"shiftleft(cast(1 as bigint), {m})"
        return f"(cast({m} as bigint) * {scale} + (({x} - {p}) * {scale}) div {p})"
    p = f"(1::BIGINT << {m})"
    return f"(CAST({m} AS BIGINT) * {scale} + (({x} - {p}) * {scale}) // {p})"


def train_hashed_weights(
    docs: DataFrame,
    label_col: str,
    n_buckets: int = 4096,
    seed: int = 7,
    scale: int = 65536,
    text_col: str = "text",
) -> DataFrame:
    """Train the hashed linear model: one-pass per-class token counts →
    integer-quantized Naive-Bayes log-odds weights. Returns the FULL
    (bucket, n_pos, n_neg, weight) table — all `n_buckets` rows, zero
    counts included — ready to pass as `hashed_linear_classify(weights=)`.

    `docs` must carry a boolean `label_col` (the training label — e.g. a
    heuristic gate like gopher_rules' conjunction for distillation, or
    human labels joined upstream); NULL-labeled rows are ignored. Keeping
    the label a column of `docs` (not a separate keyed table) means the
    token stream never joins or shuffles to learn its label — it is carried
    through the explode from the same row.

    Weight (Laplace α=1, B = n_buckets, all fixed-point via log2_fp_sql):

        w(b) = [lg(n_pos_b + 1) − lg(pos_tot + B)]
             − [lg(n_neg_b + 1) − lg(neg_tot + B)]

    i.e. scale·log2 of the smoothed class-likelihood ratio
    P(b|pos)/P(b|neg) — the multinomial Naive-Bayes per-feature log-odds.
    All-bigint, so training is exact, partition-invariant, and carries a
    DuckDB value oracle just like the margin it feeds.

    Scale shape (100 TB): single corpus scan → JVM explode (label carried
    along) → ONE groupBy(bucket) shuffle of pre-aggregated partial counts
    (map-side combine; ≤ n_buckets groups). Totals re-aggregate the tiny
    bucket table (1 row, broadcast back); the range(n_buckets) frame join
    is broadcast-size. No Python anywhere.
    """
    if n_buckets <= 0 or scale <= 0:
        raise ValueError("n_buckets and scale must be positive")
    spark = docs.sparkSession
    y = F.col(label_col)
    tok = (
        docs.filter(y.isNotNull())
        .select(
            y.alias("__y"),
            F.explode(tokens(F.col(text_col))).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .withColumn(
            "bucket",
            _md5_int60(F.concat(F.lit(f"t:{seed}:"), F.col("tok"))) % n_buckets,
        )
    )
    counts = tok.groupBy("bucket").agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).cast("bigint").alias("n_pos"),
        F.sum(F.when(F.col("__y"), 0).otherwise(1)).cast("bigint").alias("n_neg"),
    )
    full = (
        spark.range(n_buckets)
        .select(F.col("id").cast("bigint").alias("bucket"))
        .join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_pos", F.lit(0)).cast("bigint").alias("n_pos"),
            F.coalesce("n_neg", F.lit(0)).cast("bigint").alias("n_neg"),
        )
    )
    totals = full.agg(
        F.sum("n_pos").cast("bigint").alias("__pt"),
        F.sum("n_neg").cast("bigint").alias("__nt"),
    )
    lg = lambda x: log2_fp_sql(x, scale)  # noqa: E731
    return (
        full.join(F.broadcast(totals))  # 1-row totals broadcast (sanctioned)
        .withColumn(
            "weight",
            F.expr(
                f"({lg('n_pos + 1')} - {lg(f'__pt + {n_buckets}')})"
                f" - ({lg('n_neg + 1')} - {lg(f'__nt + {n_buckets}')})"
            ).cast("bigint"),
        )
        .select("bucket", "n_pos", "n_neg", "weight")
    )


def hashed_linear_classify(
    docs: DataFrame,
    weights: DataFrame | None = None,
    n_buckets: int = 4096,
    seed: int = 7,
    bias: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document with the hashed linear model; returns
    (id_col, n_tokens: bigint, margin: bigint, label: string) where
    margin = bias + Σ_tokens weight[hash(token) % n_buckets] and
    label = 'keep' iff margin ≥ 0.

    Documents with zero (non-empty) tokens are excluded — they have no
    features to score (gate them upstream with a length rule instead).
    """
    if weights is None:
        weights = standin_weights(docs.sparkSession, n_buckets, seed)
    tok = (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .withColumn(
            "bucket",
            _md5_int60(F.concat(F.lit(f"t:{seed}:"), F.col("tok"))) % n_buckets,
        )
    )
    scored = (
        tok.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("weight") + F.lit(bias)).cast("bigint").alias("margin"),
        )
    )
    return scored.select(
        id_col,
        "n_tokens",
        "margin",
        F.when(F.col("margin") >= 0, F.lit("keep")).otherwise(F.lit("drop")).alias(
            "label"
        ),
    )


def _hashed_grams(
    docs: DataFrame, seed: int, n_buckets: int, id_col: str, *extra
) -> DataFrame:
    """Explode each document into its hashed n-gram feature stream
    (unigrams + adjacent bigrams, the DSIR feature set — Xie et al.
    NeurIPS'23, arXiv:2302.03169 §3.1). `docs` must carry the token array
    as `__tk` (precomputed once by the caller so the tokenizer runs one
    time per row, not per gram reference). Empty tokens are filtered
    BEFORE bigram formation so 'a  b' and 'a b' produce the same bigram;
    bigrams are space-joined ('w1 w2'), which cannot collide with any
    unigram pre-hash because unigrams never contain a space. One JVM
    expression builds the combined gram array — a single corpus scan, no
    Python."""
    ftk = "filter(__tk, t -> t <> '')"
    # Bigrams via zip_with against the 1-shifted array: the shorter slice
    # pads with NULL, concat(NULL) -> NULL, and the filter drops it — no
    # index arithmetic, so 0- and 1-token docs are safe under ANSI (a
    # sequence(1, size-1) formulation would emit the DESCENDING [1, 0]
    # for single-token docs and fault on element_at(ftk, 0)).
    grams = docs.select(
        F.col(id_col),
        *extra,
        F.explode(
            F.expr(
                f"concat({ftk}, filter(zip_with({ftk},"
                f" slice({ftk}, 2, size({ftk})),"
                f" (a, b) -> concat(a, ' ', b)), x -> x is not null))"
            )
        ).alias("gram"),
    )
    return grams.withColumn(
        "bucket",
        _md5_int60(F.concat(F.lit(f"g:{seed}:"), F.col("gram"))) % n_buckets,
    )


def dsir_importance(
    docs: DataFrame,
    target_col: str,
    n_buckets: int = 4096,
    seed: int = 7,
    scale: int = 65536,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data Selection via Importance Resampling weights (DSIR — Xie et
    al., NeurIPS'23, arXiv:2302.03169): score every RAW document by how
    much more likely its hashed n-gram profile is under the TARGET
    distribution than under the raw distribution,

        log w(doc) = Σ_grams [ log2 p_target(b) − log2 p_raw(b) ],

    with bucket probabilities estimated by Laplace-smoothed hashed
    unigram+bigram counts (B = `n_buckets` slots, the paper's hashed
    n-gram generative model). `docs` must carry a boolean `target_col`
    marking the target slice (e.g. a curated corpus flag, a quality-gate
    verdict, or an upstream join); rows where it is NULL are ignored for
    estimation and scoring. Returns one row per RAW (non-target) doc:
    (id_col, n_grams: bigint, logw_fp: bigint, target_like: boolean)
    where logw_fp is the fixed-point (scale·bits) log-ratio and
    target_like = logw_fp ≥ 0. Downstream, resample raw docs by weight
    (or threshold on logw_fp) to tilt a 100 TB crawl toward the target.

    Exactness: per-bucket log-ratios use log2_fp_sql over exact bigint
    counts, so the per-doc sum is all-integer — order-independent,
    partition-invariant, and DuckDB-oracle-able (a data-selection policy
    with a bit-exact value oracle). Overflow: |per-bucket ratio| <
    2·scale·63 ≈ 8.3e6; a doc needs ~1e12 grams to overflow the bigint
    margin — unreachable.

    Scale shape (100 TB): one corpus scan explodes grams JVM-side (the
    target flag rides the same row — no label join); ONE groupBy(bucket)
    shuffle of map-combined partial counts (≤ B groups) trains both
    distributions in the same pass; the B-row ratio table joins back
    BROADCAST against the raw-side gram stream; one groupBy(doc) integer
    sum. Identical execution shape to hashed_linear_classify — the
    weight table is estimated, not handed in.
    """
    if n_buckets <= 0 or scale <= 0:
        raise ValueError("n_buckets and scale must be positive")
    spark = docs.sparkSession
    y = F.col(target_col)
    tagged = docs.filter(y.isNotNull()).withColumn("__tk", tokens(F.col(text_col)))
    g = _hashed_grams(tagged, seed, n_buckets, id_col, y.alias("__y"))
    counts = g.groupBy("bucket").agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).cast("bigint").alias("n_tgt"),
        F.sum(F.when(F.col("__y"), 0).otherwise(1)).cast("bigint").alias("n_raw"),
    )
    full = (
        spark.range(n_buckets)
        .select(F.col("id").cast("bigint").alias("bucket"))
        .join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_tgt", F.lit(0)).cast("bigint").alias("n_tgt"),
            F.coalesce("n_raw", F.lit(0)).cast("bigint").alias("n_raw"),
        )
    )
    totals = full.agg(
        F.sum("n_tgt").cast("bigint").alias("__tt"),
        F.sum("n_raw").cast("bigint").alias("__rt"),
    )
    lg = lambda x: log2_fp_sql(x, scale)  # noqa: E731
    ratios = (
        full.join(F.broadcast(totals))  # 1-row totals broadcast (sanctioned)
        .withColumn(
            "logr_fp",
            F.expr(
                f"({lg('n_tgt + 1')} - {lg(f'__tt + {n_buckets}')})"
                f" - ({lg('n_raw + 1')} - {lg(f'__rt + {n_buckets}')})"
            ).cast("bigint"),
        )
        .select("bucket", "logr_fp")
    )
    raw_g = _hashed_grams(tagged.filter(~y), seed, n_buckets, id_col)
    return (
        raw_g.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum("logr_fp").cast("bigint").alias("logw_fp"),
        )
        .select(
            id_col,
            "n_grams",
            "logw_fp",
            (F.col("logw_fp") >= 0).alias("target_like"),
        )
    )


def corpus_kl_divergence(
    docs: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-group add-1-smoothed KL divergence (bits) of each group's token
    distribution against the REST of the corpus, over the shared global
    vocabulary. Returns (group_col, n_tokens, kl_fp, kl_bits). Semantics,
    exactness, and the 100 TB shape are documented on the registry entry
    (plans/classify.q_corpus_divergence), which delegates here; this lives
    at operator level so the scale study can drive it over synthetic
    corpora at any volume."""
    tok = (
        docs.select(group_col, F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
    )
    cst = tok.groupBy(group_col, "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_st")
    )
    ct = cst.groupBy("tok").agg(F.sum("c_st").cast("bigint").alias("c_t"))
    ns = cst.groupBy(group_col).agg(F.sum("c_st").cast("bigint").alias("n_s"))
    tot = ct.agg(
        F.sum("c_t").cast("bigint").alias("n_tot"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    lg = lambda x: log2_fp_sql(x)  # noqa: E731
    contrib = (
        ct.crossJoin(F.broadcast(ns))  # V×S vocab-granularity frame
        .join(cst, [group_col, "tok"], "left")
        .withColumn("c_st", F.coalesce("c_st", F.lit(0)).cast("bigint"))
        .join(F.broadcast(tot))  # 1-row (N, V) broadcast (sanctioned)
        .withColumn(
            "contrib_fp",
            F.expr(
                f"(c_st + 1) * ({lg('c_st + 1')} - {lg('n_s + v')}"
                f" - {lg('c_t - c_st + 1')} + {lg('n_tot - n_s + v')})"
            ).cast("bigint"),
        )
    )
    return (
        contrib.groupBy(group_col, "n_s", "v")
        .agg(F.sum("contrib_fp").cast("bigint").alias("kl_fp"))
        .select(
            group_col,
            F.col("n_s").alias("n_tokens"),
            "kl_fp",
            (
                F.col("kl_fp").cast("double")
                / ((F.col("n_s") + F.col("v")) * 65536).cast("double")
            ).alias("kl_bits"),
        )
    )


def char_entropy(docs: DataFrame, low_fp: int = 3 * 65536) -> DataFrame:
    """Character-level Shannon entropy per document in EXACT fixed point —
    the gibberish/boilerplate gate (plans/classify.q_char_entropy_filter).
    N·H = Σ n_c·(log2 N − log2 n_c) via log2_fp_sql's integer piecewise
    log2, entropy_fp = that sum div N at scale 2^16 — bit-identical across
    engines and partitionings. Chars explode JVM-side and collapse
    map-side to (doc, char) counts, so the shuffle carries at most
    |alphabet| rows per document."""
    from ..functions.text import norm_text

    d = docs.select("doc_id", norm_text(F.col("text")).alias("norm")).filter(
        F.col("norm").isNotNull() & (F.length("norm") > 0)
    )
    # split-on-empty-regex explodes code points in ONE pass; the
    # substring(norm, i, 1) alternative re-walks the string from byte 0
    # per character (O(len^2) per doc) — measured 3x slower at sf0.1.
    ch = d.select("doc_id", F.explode(F.split(F.col("norm"), "")).alias("c"))
    cnt = ch.groupBy("doc_id", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_c")
    )
    # Σ n_c·(lg N − lg n_c) = N·lg N − Σ n_c·lg n_c (integer sums
    # distribute exactly), so the per-doc total, the alphabet size and
    # the Σ n_c·lg n_c term all come out of ONE doc-keyed aggregate —
    # the previous tot-groupBy + cnt⋈tot join (a second doc-keyed
    # shuffle plus a join per query) is pure plan overhead the algebra
    # removes (guide §2.4). Same bigint ops, same overflow bound
    # (every term ≤ the old sum's), bit-identical entropy_fp.
    lg_c = log2_fp_sql("n_c", dialect="spark")
    ent = cnt.groupBy("doc_id").agg(
        F.sum("n_c").cast("bigint").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("n_alphabet"),
        F.expr(f"cast(sum(n_c * ({lg_c})) as bigint)").alias("__s"),
    )
    lg_n = log2_fp_sql("tot", dialect="spark")
    return ent.select(
        "doc_id",
        F.col("tot").alias("n_chars_used"),
        "n_alphabet",
        F.expr(f"(tot * ({lg_n}) - __s) div tot").alias("entropy_fp"),
    ).withColumn(
        "label",
        F.when(F.col("entropy_fp") < low_fp, "low").otherwise("ok"),
    )
