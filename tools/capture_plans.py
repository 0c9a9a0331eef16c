"""Capture `.explain("formatted")` for every bench headline row into
plans/r12/<query>_<suffix>.txt — the judge-verifiable plan evidence the
optimization rounds commit alongside the code.

Usage:
    python tools/capture_plans.py <suffix> [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from s3_to_redshift_with_airflow_spark.plans import REGISTRY  # noqa: E402
from s3_to_redshift_with_airflow_spark.session import build_session  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or HEADLINE
    os.makedirs("plans/r12", exist_ok=True)
    spark = build_session(app_name="capture_plans")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(f"plans/r12/{name}_{suffix}.txt", "w") as f:
            f.write(buf.getvalue())
        print(f"captured {name}")
    spark.stop()


if __name__ == "__main__":
    main()
