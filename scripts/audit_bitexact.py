#!/usr/bin/env python
"""Bit-exactness audit: run every catalog entry and its DuckDB oracle at
$SPARK_GRAFT_TEST_SF_DIR (default sf0.01) and compare values EXACTLY — the
driver's correctness gate hashes values, so tolerance-level agreement is not
enough (round 1 lost 2 entries to float-ulp drift that the tolerance-based
pytest passed).

Prints one line per entry: OK (bit-equal), DRIFT (floats differ within 1e-6
relative — would fail the driver hash), or MISMATCH/ERROR.
"""

from __future__ import annotations

import math
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


def main() -> None:
    import duckdb

    from tesseract_spark import catalog
    from tesseract_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    only = sys.argv[1:]

    spark = get_spark("bitexact_audit")
    duck = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_ok = n_drift = n_bad = 0
    for name in sorted(catalog.ENTRIES):
        if only and name not in only:
            continue
        entry = catalog.ENTRIES[name]
        if entry.oracle is None:
            print(f"{name:35s} NO-ORACLE")
            continue
        try:
            sdf = entry.spark_fn(spark, sf_dir).toPandas()
            ddf = duck.execute(entry.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name:35s} ERROR {type(e).__name__}: {e}")
            n_bad += 1
            continue
        cols = sorted(sdf.columns)
        if cols != sorted(ddf.columns):
            print(f"{name:35s} COLS {cols} vs {sorted(ddf.columns)}")
            n_bad += 1
            continue
        sdf = sdf[cols].sort_values(by=cols, ignore_index=True)
        ddf = ddf[cols].sort_values(by=cols, ignore_index=True)
        if len(sdf) != len(ddf):
            print(f"{name:35s} ROWS {len(sdf)} vs {len(ddf)}")
            n_bad += 1
            continue
        # The driver's value hash is sensitive to the pandas KIND of a column,
        # not its width or unit: a DuckDB HUGEINT column fetches as float64
        # while Spark emits int64, and that int-vs-float change alone failed
        # the external hash on ALL nine r4 entries (identical values). But
        # int32-vs-int64 and datetime64[ns]-vs-[us] mismatches were driver-
        # GREEN in r4 (q_events_top_types had both), so only a kind change
        # ('i' vs 'f'/'O'/'M' etc.) is fatal here.
        def _kind(dt) -> str:
            k = dt.kind
            return "i" if k == "u" else k

        dt_bad = [
            f"{c}: spark={sdf[c].dtype} oracle={ddf[c].dtype}"
            for c in cols
            if _kind(sdf[c].dtype) != _kind(ddf[c].dtype)
        ]
        if dt_bad:
            print(f"{name:35s} DTYPE {'; '.join(dt_bad)}")
            n_bad += 1
            continue
        worst_ulps = 0
        worst_rel = 0.0
        worst_col = ""
        exact = True
        for c in cols:
            for a, b in zip(sdf[c].tolist(), ddf[c].tolist()):
                # None, float NaN, or pandas NaT (x != x holds exactly for
                # NaN/NaT)
                if (a is None or a != a) and (b is None or b != b):
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if a != b:
                        exact = False
                        ulps = abs(bits(a) - bits(b))
                        rel = abs(a - b) / max(abs(a), abs(b), 1e-300)
                        if rel > worst_rel:
                            worst_rel, worst_ulps, worst_col = rel, ulps, c
                elif a != b:
                    exact = False
                    worst_rel = float("inf")
                    worst_col = c
        if exact:
            print(f"{name:35s} OK    rows={len(sdf)}")
            n_ok += 1
        elif worst_rel < 1e-6:
            print(
                f"{name:35s} DRIFT col={worst_col!r} rel={worst_rel:.2e} "
                f"ulps={worst_ulps}"
            )
            n_drift += 1
        else:
            print(f"{name:35s} MISMATCH col={worst_col!r} rel={worst_rel:.2e}")
            n_bad += 1
    print(f"\n{n_ok} bit-exact, {n_drift} drift, {n_bad} bad")
    sys.exit(1 if (n_drift or n_bad) else 0)


if __name__ == "__main__":
    main()
