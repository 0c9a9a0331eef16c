"""Text-analysis column functions for large-scale document pipelines.

All pure built-in Spark expressions (JVM-side, codegen'd — no Python in the
hot path): tokenization, token/char statistics, punctuation ratios, language
identification (stopword-marker heuristic), quality scoring, and document
fingerprinting (normalized-content hash).

These extend the reference's text surface (it only lowercases genres,
reference: dags/etl/schema_check.py:178) to the LLM-training-data operators
mandated by BASELINE.json: language-ID, quality scoring, token counting,
fingerprinting — each designed to run in one scan over a 100 TB documents
table.

Determinism: every float is produced by scalar IEEE ops over exact integer
counts with a fixed expression tree — bit-identical across engines and
partitionings (no order-dependent double reductions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
# Alphabetical language order is the documented tie-break.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "and", "of", "to", "in", "is", "that", "it"],
    "es": ["el", "los", "las", "una", "que", "por", "con", "para"],
    "fr": ["le", "les", "des", "est", "dans", "pour", "avec", "sur"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + ["a", "an", "for", "on", "with", "as", "at", "by"]

# BPE-ish lexer: word pieces, digit runs, or single non-space symbols —
# the classic pre-tokenization shape (letters | digits | other-nonspace).
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def norm_text(c: Column) -> Column:
    """Normalize: lowercase, trim, collapse internal whitespace runs."""
    return F.regexp_replace(F.lower(F.trim(c)), "\\s+", " ")


def bind1(value: Column, fn) -> Column:
    """Let-binding: evaluate `value` ONCE per row and hand it to `fn` as a
    bound lambda variable.

    Why this exists: "bind the expensive expression to a column first"
    (two chained selects) does NOT survive optimization — CollapseProject
    merges the projections and re-inlines the expression into every
    reference. References inside higher-order-function lambdas are the
    killer: lambda bodies are interpreted with no common-subexpression
    elimination, so a captured tokenizer/hash expression re-runs PER
    ELEMENT (O(len²) for shingling — measured 4.64 s → 0.56 s at sf0.1
    on the shingle pass alone, bit-identical output). Wrapping the value
    in a single-element array and referencing it through the lambda
    variable pins exactly one evaluation per row; the optimizer cannot
    inline through a NamedLambdaVariable."""
    return F.get(F.transform(F.array(value), fn), 0)


def tokens(c: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(norm_text(c), " ")


def token_count(c: Column) -> Column:
    return F.size(tokens(c)).cast("bigint")


def bpe_ish_token_count(c: Column) -> Column:
    """Token count under the BPE-ish lexer (regexp scan, no array built)."""
    return F.size(F.regexp_extract_all(norm_text(c), F.lit(BPE_ISH_PATTERN), 0)).cast(
        "bigint"
    )


def char_count(c: Column) -> Column:
    return F.length(c).cast("bigint")


def punct_count(c: Column) -> Column:
    """ASCII punctuation characters (Java \\p{Punct} ≡ POSIX [[:punct:]])."""
    return F.length(F.regexp_replace(c, "[^\\p{Punct}]", "")).cast("bigint")


def stopword_count(c: Column, stopwords: list[str] | None = None) -> Column:
    words = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    return F.size(F.filter(tokens(c), lambda t: F.array_contains(words, t))).cast(
        "bigint"
    )


def fingerprint(c: Column) -> Column:
    """Content fingerprint: md5 of the normalized text. Identical documents
    (modulo case/whitespace) collide by construction — the exact-dedup key."""
    return F.md5(norm_text(c))


def lang_scores(c: Column) -> dict[str, Column]:
    """Marker-hit count per language over the token set."""
    toks = tokens(c)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast(
            "bigint"
        )
    return out


def lang_id(c: Column) -> Column:
    """Heuristic language ID: argmax marker-hit count; ties broken by
    alphabetical language code; zero hits → 'und' (BCP-47 undetermined)."""
    scores = lang_scores(c)
    mx = F.greatest(*scores.values())
    expr = F.lit("und")
    # Build the CASE chain in reverse-alphabetical order so that the final
    # expression checks languages alphabetically first (first-match wins).
    for lang in sorted(scores, reverse=True):
        expr = F.when((mx > 0) & (scores[lang] == mx), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(c: Column) -> Column:
    """Composite quality score in [0,1]: length, punctuation, stopword, and
    word-shape signals — the standard cheap pre-filter for web-scale corpora.

    score = 0.3*min(tokens/100,1) + 0.3*(1-punct_ratio)
          + 0.2*min(stop_ratio*5,1) + 0.2*min(avg_word_len/8,1)
    """
    n_tok = token_count(c).cast("double")
    n_char = char_count(c).cast("double")
    n_punct = punct_count(c).cast("double")
    n_stop = stopword_count(c).cast("double")
    # chars excluding spaces ≈ sum of word lengths
    n_nonspace = F.length(F.regexp_replace(norm_text(c), " ", "")).cast("double")
    punct_ratio = n_punct / F.greatest(n_char, F.lit(1.0))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1.0))
    avg_word_len = n_nonspace / F.greatest(n_tok, F.lit(1.0))
    return (
        F.lit(0.3) * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.2) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
        + F.lit(0.2) * F.least(avg_word_len / F.lit(8.0), F.lit(1.0))
    )


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct n-gram shingles from an ALREADY-TOKENIZED array column.

    `toks` must be a cheap reference (a materialized column or a `bind1`
    lambda variable), never an inline `tokens(text)` expression: the
    tokenizer would be captured inside the per-element lambda and re-run
    per shingle (interpreted lambdas get no common-subexpression
    elimination). A plain two-step select does NOT count as binding —
    CollapseProject re-inlines it; use `bind1`."""
    count = F.size(toks) - (n - 1)
    # Guard: F.sequence(1, 0) yields a DESCENDING [1, 0], not an empty array,
    # so short documents must short-circuit to [].
    return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        )
    )


def token_shingles(c: Column, n: int = 3) -> Column:
    """Distinct n-gram token shingles (array<string>) — the unit set for
    Jaccard/MinHash near-dup detection. Empty array when fewer than n tokens.
    The token array is let-bound (`bind1`) so the tokenizer runs once per
    row, not once per shingle."""
    return bind1(tokens(c), lambda tk: shingles_from_tokens(tk, n))


def positional_token_shingles(c: Column, n: int = 5) -> Column:
    """ORDERED, non-distinct n-gram token shingles (array<string>) — the
    positional k-gram stream winnowing fingerprints select from (Schleimer,
    Wilkerson & Aiken, SIGMOD'03). Unlike `token_shingles`, position and
    multiplicity matter, so no array_distinct. Empty array when fewer than
    n tokens. Tokens are let-bound (`bind1`) — one tokenize per row."""

    def _grams(toks: Column) -> Column:
        count = F.size(toks) - (n - 1)
        # Same sequence guard as token_shingles: F.sequence(1, 0) descends.
        return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        )

    return bind1(tokens(c), _grams)


def gopher_rules(
    c: Column,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_fraction: float = 0.8,
    min_stopword_hits: int = 2,
    min_distinct_fraction: float = 0.3,
) -> dict[str, Column]:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1 — public
    heuristics), each as a boolean column, adapted to the signals this
    corpus carries:

      r_word_count        token count within [min_tokens, max_tokens]
      r_mean_word_len     mean word length within [min, max]
      r_alpha_fraction    ≥ min_alpha_fraction of tokens contain a letter
      r_stopwords         ≥ min_stopword_hits stopword occurrences
      r_distinct_fraction distinct-token fraction ≥ threshold (the
                          duplicate-line signal, at token granularity)

    Unlike quality_score (one blended float), these are the HARD per-rule
    gates a pretraining pipeline applies and audits individually; compose
    `passes` as the conjunction. All counts are integers and every float is
    one scalar IEEE expression — engine-exact for the SQL oracle."""
    toks = tokens(c)
    n_tok = F.size(toks).cast("double")
    n_nonspace = F.length(F.regexp_replace(norm_text(c), " ", "")).cast("double")
    mean_wl = n_nonspace / F.greatest(n_tok, F.lit(1.0))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double")
    n_stop = stopword_count(c).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    return {
        "r_word_count": (n_tok >= min_tokens) & (n_tok <= max_tokens),
        "r_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "r_alpha_fraction": n_alpha / F.greatest(n_tok, F.lit(1.0))
        >= min_alpha_fraction,
        "r_stopwords": n_stop >= min_stopword_hits,
        "r_distinct_fraction": n_distinct / F.greatest(n_tok, F.lit(1.0))
        >= min_distinct_fraction,
    }


# Cleaning patterns: kept to the syntax subset Java regex and RE2 (DuckDB)
# interpret identically, so cleaned text is engine-reproducible.
HTML_TAG_PATTERN = "<[^>]+>"
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
URL_PATTERN = "https?://[^\\s]+"


def clean_text(c: Column) -> Column:
    """Pretraining text cleanup: strip HTML tags, mask emails and URLs with
    typed placeholders, collapse whitespace. Order matters: URLs before
    emails would still be safe here, but tags must go first so attribute
    urls inside tags vanish with the tag."""
    out = F.regexp_replace(c, HTML_TAG_PATTERN, " ")
    out = F.regexp_replace(out, URL_PATTERN, "<URL>")
    out = F.regexp_replace(out, EMAIL_PATTERN, "<EMAIL>")
    return F.trim(F.regexp_replace(out, "\\s+", " "))


# PII patterns (same Java/RE2-shared syntax subset as the cleaning patterns
# above). Ordered dict = scrub order; patterns are mutually exclusive on any
# single span (@ / 3-3-4 dashes / 3-2-4 dashes / dotted quads), so scrub
# order can't change counts — it's fixed anyway for reproducibility.
PII_PATTERNS = {
    "email": EMAIL_PATTERN,
    "phone": "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b",
    "ssn": "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b",
    "ipv4": "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
}


def pii_counts(c: Column) -> dict[str, Column]:
    """Per-category PII match counts (JVM regexp_count — codegen, no UDF).
    Counted on the input as-is, independent of scrub order."""
    return {k: F.regexp_count(c, F.lit(p)).cast("bigint") for k, p in PII_PATTERNS.items()}


def pii_scrub(c: Column) -> Column:
    """Mask every PII match with its typed placeholder (<EMAIL>, <PHONE>,
    <SSN>, <IPV4>). Phone before SSN so the 3-3-4 grouping is claimed by
    the more specific pattern first (they can't overlap, but the fixed
    order makes the output bytes reproducible by construction)."""
    out = c
    for k, p in PII_PATTERNS.items():
        out = F.regexp_replace(out, p, f"<{k.upper()}>")
    return out
