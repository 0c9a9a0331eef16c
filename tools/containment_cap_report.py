"""Measured candidate-volume reduction from containment_pairs' max_df
stop-shingle cap (VERDICT r5 next-round #5): count the exact-verify
CANDIDATE pairs (the quantity the cap bounds) and the surviving verified
pairs, capped vs uncapped, plus wall time for the full operator both ways.

Corpus shape matters here, and the clean synthetic corpus shows WHY the
prefix filter is already strong: hot shingles sort LAST in the
frequency-ascending canonical order, so they never enter an A-prefix and
the cap removes nothing (measured: 0.0 reduction). The pathology the cap
exists for is a doc that consists mostly of boilerplate — its prefix IS
hot shingles, and each such doc joins the full n_docs-long posting lists,
a quadratic candidate blowup. So the report corpus is the realistic bad
case: a constant boilerplate template appended to EVERY doc (footer /
license header) plus a slice of pure-template docs (empty pages). The cap
drops the template shingles from candidate generation; the documented
recall trade is that pure-boilerplate-only duplicates are missed.

Emits one JSON line per scale; append to SCALE_r{N}.jsonl.

Usage: python tools/containment_cap_report.py [--mults 10] [--max-df 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from s3_to_redshift_with_airflow_spark.operators.dedup import (  # noqa: E402
    _persist_shingled,
    _shingled,
    containment_candidates,
    containment_pairs,
    release_shingle_cache,
)
from s3_to_redshift_with_airflow_spark.session import build_session  # noqa: E402
from s3_to_redshift_with_airflow_spark.sources.synthetic import (  # noqa: E402
    synthetic_documents,
)

BASE_DOCS = 5_000  # sf0.1 documents rows (scale_study.py's anchor)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="10")
    ap.add_argument("--max-df", type=int, default=64)
    args = ap.parse_args()
    spark = build_session(app_name="containment_cap_report")
    from pyspark.sql import functions as F

    boiler = " ".join(f"b{i}" for i in range(12))
    for mult in (int(m) for m in args.mults.split(",")):
        n = BASE_DOCS * mult
        base = synthetic_documents(spark, n)
        docs = (
            base.select(
                "doc_id",
                F.concat(F.col("text"), F.lit(" " + boiler)).alias("text"),
            )
            .unionByName(
                spark.range(n // 20).select(
                    (F.col("id") + 10 * n).alias("doc_id"),
                    F.lit(boiler).alias("text"),
                )
            )
            .localCheckpoint()
        )
        sh = _persist_shingled(_shingled(docs, "doc_id", "text", 3))
        cands_exact = containment_candidates(sh, "doc_id", 4, 5, None).count()
        cands_capped = containment_candidates(
            sh, "doc_id", 4, 5, args.max_df
        ).count()
        timings = {}
        pairs = {}
        for label, cap in (("exact", None), ("capped", args.max_df)):
            release_shingle_cache()
            t0 = time.time()
            pairs[label] = containment_pairs(
                docs, threshold=0.8, max_df=cap
            ).count()
            timings[label] = round(time.time() - t0, 3)
        release_shingle_cache()
        docs.unpersist()
        print(
            json.dumps(
                {
                    "family": "containment_dfcap",
                    "scale": f"x{mult}",
                    "rows": n,
                    "max_df": args.max_df,
                    "candidates_exact": cands_exact,
                    "candidates_capped": cands_capped,
                    "candidate_reduction": round(
                        1 - cands_capped / cands_exact, 4
                    )
                    if cands_exact
                    else 0.0,
                    "pairs_exact": pairs["exact"],
                    "pairs_capped": pairs["capped"],
                    "sec_exact": timings["exact"],
                    "sec_capped": timings["capped"],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
