#!/usr/bin/env python
"""Bare-session dress rehearsal: run catalog entries under the HOSTILE
session an external harness would supply — ANSI on, a non-UTC timezone,
200 shuffle partitions, none of get_spark's pinned confs — and compare
values exactly against the DuckDB oracles.

The engine's per-entry conf pinning (ANSI off at call time, UTC for
timestamp entries, nanos decode) is what makes results session-independent;
this script is the proof. A failure here predicts an external-driver
failure that the get_spark-based audit cannot see.

Usage: python scripts/dress_rehearsal.py [entry ...]   (default: ALL)
Env:   SPARK_GRAFT_TEST_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "200")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    from tesseract_spark import catalog

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    only = sys.argv[1:]
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    n_ok = n_bad = 0
    for name in sorted(catalog.ENTRIES):
        if only and name not in only:
            continue
        entry = catalog.ENTRIES[name]
        try:
            sdf = entry.spark_fn(spark, sf).toPandas()
            if entry.oracle is None:
                # the documented rows-only case (q_bpe_merges): mirror the
                # driver's weaker check — the entry must run and emit rows
                # under the hostile session
                ok = len(sdf) > 0
                print(f"{name:35s} {'OK (rows-only)' if ok else 'BAD'}")
                n_ok += ok
                n_bad += not ok
                continue
            ddf = con.execute(entry.oracle).fetchdf()
            cols = sorted(sdf.columns)
            ok = cols == sorted(ddf.columns)
            if ok:
                sdf = sdf[cols].sort_values(by=cols, ignore_index=True)
                ddf = ddf[cols].sort_values(by=cols, ignore_index=True)
                ok = len(sdf) == len(ddf)
            if ok:
                for c in cols:
                    for a, b in zip(sdf[c].tolist(), ddf[c].tolist()):
                        if (a is None or a != a) and (b is None or b != b):
                            continue
                        if a != b:
                            ok = False
                            break
                    if not ok:
                        break
            print(f"{name:35s} {'OK' if ok else 'BAD'}")
            n_ok += ok
            n_bad += not ok
        except Exception as e:  # noqa: BLE001
            print(f"{name:35s} ERROR {type(e).__name__}: {e}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad under bare session")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
