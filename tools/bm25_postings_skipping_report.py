"""Measured parquet data-skipping from the BM25 postings layout (the
serve-side claim behind operators/retrieval.write_bm25_index): write the
SAME postings two ways — shuffled (what a plain groupBy output looks
like) and range-partitioned + sorted by term (the index layout) — then
probe 3 query terms against each and read the scan's actual
`numOutputRows` (rows materialized after row-group/page pruning + the
pushed In(term) filter).

Expected physics: the sorted layout materializes ~the queried posting
lists (every row group's term min/max brackets a narrow slice); the
shuffled layout's row groups all span the vocabulary, so nothing prunes
and the scan materializes the matching rows only AFTER decoding every
group — visible as a near-total-scan numOutputRows ratio when page
indexes can't help.

Rows-materialized is engine/layout-dependent, so this is a measurement
TOOL + PERF.md note, not an oracle; the serve path itself is exact-oracled
(bm25_index_search).

Usage: python tools/bm25_postings_skipping_report.py [sf_dir]
Emits one JSON line per (layout, probe) + a summary line.
"""

from __future__ import annotations

import json
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from s3_to_redshift_with_airflow_spark.operators.retrieval import (  # noqa: E402
    bm25_index_build,
)
from s3_to_redshift_with_airflow_spark.session import build_session  # noqa: E402

TERMS = ["vector", "merge", "window"]


def scan_rows(df) -> int:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()

    def walk(node):
        name = node.nodeName()
        if "Scan" in name:
            m = node.metrics()
            it = m.iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    return kv._2().value()
        for i in range(node.children().size()):
            got = walk(node.children().apply(i))
            if got is not None:
                return got
        return None

    return walk(plan)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="bm25_skipping")
    spark.conf.set("spark.sql.parquet.filterPushdown", "true")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    postings, _, _ = bm25_index_build(docs)
    postings = postings.localCheckpoint()
    total = postings.count()
    match = postings.filter(F.col("term").isin(TERMS)).count()

    base = tempfile.mkdtemp(prefix="bm25_skip_")
    # layout 1: shuffled — whatever partitioning the groupBy left behind
    postings.write.parquet(f"{base}/shuffled")
    # layout 2: the index layout — range-partitioned + sorted by term
    (
        postings.repartitionByRange(F.col("term"))
        .sortWithinPartitions("term", "doc_id")
        .write.parquet(f"{base}/sorted")
    )

    out = {}
    for layout in ("shuffled", "sorted"):
        probe = spark.read.parquet(f"{base}/{layout}").filter(
            F.col("term").isin(TERMS)
        )
        got = scan_rows(probe)
        out[layout] = got
        print(
            json.dumps(
                {
                    "layout": layout,
                    "probe_terms": TERMS,
                    "total_rows": total,
                    "matching_rows": match,
                    "scan_rows_materialized": got,
                    "skipped_pct": round(100 * (1 - got / total), 1),
                }
            )
        )
    print(
        json.dumps(
            {
                "summary": "bm25 postings skipping",
                "sorted_vs_shuffled_materialization_ratio": round(
                    out["sorted"] / max(out["shuffled"], 1), 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
