"""Vector column functions over ArrayType embeddings.

Pure built-in higher-order functions (JVM-side): dot product, norms, cosine
similarity as sequential folds. The fold order is fixed (left-to-right), so
results are bit-deterministic and engine-comparable — verified bit-identical
against DuckDB's list_sum fold on the driver testdata.

Elements are cast to double BEFORE any arithmetic: float32 accumulation
differs between engines and loses precision at 64+ dims.

Scale path: these expressions run inside whole-stage codegen per row — no
shuffle, no Python. For top-k search over N vectors see
operators/similarity.py (brute-force scan baseline + hyperplane-LSH bucketed
variant).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import bind1


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (bit-deterministic)."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    # Same IEEE op sequence as sqrt(dot(a, a)) — multiply then accumulate,
    # left-to-right — but folds x·x inside one pass over as_double(a)
    # instead of materializing two casted copies plus a zip_with array.
    return F.sqrt(
        F.aggregate(as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs (guarded division).

    Both norms are let-bound (`bind1`): the whole expression evaluates
    interpreted (HOF parent), where each of the two references per norm
    (zero guard + divisor) would re-run its O(dim) fold."""
    return bind1(
        norm(a),
        lambda na: bind1(
            norm(b),
            lambda nb: F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(
                dot(a, b) / (na * nb)
            ),
        ),
    )


def l2_normalize(v: Column) -> Column:
    """Unit-normalize (zero vectors pass through unchanged).

    The norm is let-bound (`bind1`): referenced inside the per-element
    lambda it would re-run its O(dim) fold PER ELEMENT — O(dim²) per row
    (interpreted lambdas get no common-subexpression elimination)."""
    vd = as_double(v)
    return bind1(
        norm(v),
        lambda n: F.when(n == 0, vd).otherwise(F.transform(vd, lambda x: x / n)),
    )


# --- int8 scalar quantization ----------------------------------------------
# The storage/compute compression step of a vector index: 4× smaller than
# float32 and integer-SIMD dot products at scan time (the faiss SQ8 /
# Milvus IVF_SQ8 scheme). Everything below is a codegen'd JVM expression;
# the quantized dot product is EXACT integer arithmetic, so ranking is
# bit-reproducible on any engine/partitioning (unlike float accumulation).


def max_abs(v: Column) -> Column:
    return F.array_max(F.transform(as_double(v), F.abs))


def quant_scale(v: Column) -> Column:
    """Symmetric per-vector scale mapping [-max|x|, max|x|] → [-127, 127].
    Zero vectors get scale 0 (quantize to all-zero); so do vectors whose
    max|x| is so small (< ~7e-307) that 127/max|x| overflows to infinity —
    without that guard 0·inf = NaN poisons the codes (found by the
    hypothesis property test, not by real data).

    max|x| is let-bound (`bind1`): the whole expression runs interpreted
    (HOF parent), where the three references to `m` would each re-run the
    O(dim) array_max fold."""

    def _scale(m: Column) -> Column:
        s = F.lit(127.0) / m
        return F.when(
            m > 0, F.when(s == F.lit(float("inf")), F.lit(0.0)).otherwise(s)
        ).otherwise(F.lit(0.0))

    return bind1(max_abs(v), _scale)


def quantize_int8(v: Column) -> Column:
    """Per-vector symmetric int8 quantization: q = clamp(floor(x*s + 0.5)).

    floor(x*s + 0.5) rather than round(): half-up rounding of doubles is
    identically defined in every engine, while round() ties differ (HALF_UP
    vs HALF_EVEN) — this keeps the quantized codes engine-exact.

    The scale is let-bound (`bind1`): captured inside the per-element
    lambda it would re-run its O(dim) max-abs fold PER ELEMENT — O(dim²)
    per row (interpreted lambdas get no common-subexpression elimination;
    same class of defect as the shingle tokenizer, measured there at
    ~8× on the pass).
    """
    vd = as_double(v)
    return bind1(
        quant_scale(v),
        lambda s: F.transform(
            vd,
            lambda x: F.least(
                F.greatest(F.floor(x * s + F.lit(0.5)), F.lit(-127)), F.lit(127)
            ),
        ),
    )


def quantize_int8_fixed(v: Column, q: float = 127.0) -> Column:
    """FIXED-scale symmetric int8 quantization for unit-normalized vectors:
    code_i = clamp(floor(x_i·q + 0.5), -127, 127), ONE global scale for the
    whole corpus (vs quantize_int8's per-vector 127/max|x|).

    Why it exists: distances BETWEEN code vectors only track distances
    between the raw vectors when every vector is quantized by the SAME
    scale — per-vector scales rescale each vector differently (a unit
    vector's max|x| spans ~0.13..1.0, a 7× spread), which destroys the
    inter-vector L2 metric that ADC ranking (pq_topk / ivf_pq_topk)
    depends on. Per-vector scaling remains right for kmeans_int8-style
    WITHIN-computation uses and maximizes per-vector precision; this one
    is for cross-vector distance indexes over l2_normalize'd embeddings
    (|x_i| ≤ 1, so the clamp only ever trims the exact-±1 rounding edge).
    Same engine-exact half-up floor discipline as quantize_int8."""
    return F.transform(
        as_double(v),
        lambda x: F.least(
            F.greatest(F.floor(x * F.lit(q) + F.lit(0.5)), F.lit(-127)),
            F.lit(127),
        ),
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors (bigint fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
