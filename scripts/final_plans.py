"""Execute queries with the noop sink and capture the FINAL adaptive
plan (AdaptiveSparkPlan isFinalPlan=true) — the only place AQE's
runtime stage reuse (ReusedExchange / table-cache-free single
evaluation) is visible; the static explain shows the initial plan
only (guide §7.2).

Usage:
  SPARK_GRAFT_SF_DIR=... python scripts/final_plans.py <suffix> [q ...]

Writes plans/<SPARK_GRAFT_PLANS_DIR or plans/r15>/<query>_<suffix>.txt
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "final"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cloud_volume_spark.operators import all_queries
    from cloud_volume_spark.session import get_spark

    spark = get_spark(app_name="cvs-finalplans")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    os.makedirs(out_dir, exist_ok=True)

    qs = all_queries()
    todo = names or list(qs)
    for name in todo:
        try:
            df = qs[name](spark, sf_dir)
            spark.sparkContext.setJobDescription(f"finalplan:{name}")
            # collect() executes df's OWN QueryExecution (a noop write
            # wraps it in a fresh one whose AdaptiveSparkPlan the df
            # handle cannot see), so executedPlan() afterwards prints
            # isFinalPlan=true with runtime ReusedExchange/AQE nodes.
            t0 = time.perf_counter()
            n = len(df.collect())
            wall = time.perf_counter() - t0
            plan = df._jdf.queryExecution().executedPlan().toString()
            plan = f"-- collected {n} rows in {wall:.3f}s --\n" + plan
        except Exception as exc:
            plan = f"ERROR: {exc!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
