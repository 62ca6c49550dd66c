#!/usr/bin/env python
"""100-concurrent-client HTTP throughput/latency probe (VERDICT r5 #6).

The reference's stated design target is ~100 concurrent requests
(DESIGN.md:1-5: actix async server over the ClickHouse HTTP pool). This
probe boots the real HTTP server over the testdata cube at
$SPARK_GRAFT_SF_DIR (default sf0.1), fires N=100 aggregate calls from 100
simultaneous client threads (mixed query shapes, cache-busted so every
request does real work), and prints p50/p95/max per-request latency, wall
time, throughput, and the error count. A second pass with the response
cache warm shows the cached ceiling.

Usage: python scripts/concurrency_probe.py [n_clients]
"""

from __future__ import annotations

import concurrent.futures
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_clients = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from tesseract_spark import PlanBuilder, get_spark, testdata_registry, testdata_schema
    from tesseract_spark.logic.layer import LogicLayerConfig
    from tesseract_spark.server.app import make_server

    import tempfile

    spark = get_spark("concurrency_probe")
    builder = PlanBuilder(spark, testdata_schema(), testdata_registry(spark, sf_dir))
    cfg = LogicLayerConfig.from_json(
        {"cubes": [{"name": "lineitem_sales", "alternatives": ["sales"]}]}
    )
    # mkstemp, not the deprecated mktemp (ADVICE r14 #4: predictable name in a
    # shared tmp dir is race/symlink-prone between name pick and first write).
    # The created empty file stays in place — _WarmupManifest tolerates it
    # (json.load ValueError → empty counts) and keeping it owned closes the race.
    _mfd, manifest_path = tempfile.mkstemp(prefix="warmup_", suffix=".json")
    os.close(_mfd)
    srv = make_server(builder, port=0, logic_config=cfg, warmup_manifest=manifest_path)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    state = {"base": f"http://127.0.0.1:{srv.server_address[1]}"}
    base = state["base"]

    # mixed shapes: degenerate drill + cut, joined-dim drill, measure filter
    shapes = [
        "/cubes/lineitem_sales/aggregate.jsonrecords?drilldowns=Ship+Date.Year"
        "&measures=Quantity&cuts=Ship+Date.Ship+Date.Year.{y}",
        "/cubes/lineitem_sales/aggregate.jsonrecords?drilldowns=Part.Brand"
        "&measures=Extended+Price&cuts=Ship+Date.Ship+Date.Year.{y}",
        "/cubes/lineitem_sales/aggregate.jsonrecords?drilldowns=Return+Flag.Return+Flag"
        "&measures=Quantity,Max+Tax&cuts=Ship+Date.Ship+Date.Year.{y}",
        "/data.jsonrecords?cube=sales&drilldowns=Year&measures=Quantity&Year={y}",
    ]
    years = [1995, 1996, 1997, 1998, 1999, 2000, 2001]

    def fetch(i: int, bust: bool, tag: str = "") -> tuple[float, str | None]:
        url = state["base"] + shapes[i % len(shapes)].format(y=years[i % len(years)])
        if bust:
            url += f"&nocache={tag}{i}"
        start = time.perf_counter()
        try:
            with urllib.request.urlopen(url, timeout=600) as r:
                body = r.read()
            json.loads(body)
            return time.perf_counter() - start, None
        except Exception as e:  # noqa: BLE001 — probe must report, not die
            return time.perf_counter() - start, f"{type(e).__name__}: {e}"[:120]

    # JVM/codegen warm-up (uncounted): one call per shape, pinned to a year
    # OUTSIDE the measured combos (1994 is empty but compiles the same plan
    # shape) so the cold pass's (shape, year) plans are genuinely never-seen
    # — warming with the measured combos would pre-seed the builder's plan
    # cache for the first len(shapes) cold requests (r11 review)
    warm_shapes = [s.format(y=1994) for s in shapes]
    for i, s in enumerate(warm_shapes):
        url = base + s + f"&nocache=warm{i}"
        try:
            with urllib.request.urlopen(url, timeout=600) as r:
                r.read()
        except Exception:
            pass

    def run_pass(label: str, bust: bool, tag: str = "") -> dict:
        wall0 = time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(max_workers=n_clients) as ex:
            results = list(
                ex.map(lambda i: fetch(i, bust, tag), range(n_clients))
            )
        wall = time.perf_counter() - wall0
        lat = sorted(t for t, _ in results)
        errors = [e for _, e in results if e]
        out = {
            "pass": label,
            "clients": n_clients,
            "wall_sec": round(wall, 2),
            "throughput_rps": round(n_clients / wall, 1),
            "p50_sec": round(lat[len(lat) // 2], 3),
            "p95_sec": round(lat[int(len(lat) * 0.95)], 3),
            "max_sec": round(lat[-1], 3),
            "errors": len(errors),
        }
        if errors:
            out["first_error"] = errors[0]
        return out

    # cold = worst case: 100 never-seen query shapes at once, so every
    # request pays the driver-side plan build, Catalyst optimize+planning,
    # per-literal codegen, and a FULL scan+aggregate execution (duplicates
    # of an in-flight plan wait on the single-flight future and then on
    # AQE's final-plan monitor). steady = plan-warm repeat-query latency
    # (r12 honesty fix: a repeat collect on a cached plan reuses its
    # materialized AQE shuffle stages, so it re-runs only the final stage —
    # NOT a full re-scan; data changes require /flush, which invalidates
    # these plans, so no staleness is introduced beyond the registry's
    # documented file-listing pin). The reference's "low latency at 100
    # concurrent" target is about steady state, not 100 simultaneous cold
    # compiles.
    # Min-of-3 cold protocol (VERDICT r13 #2: single-run cold numbers swing
    # ±65% run-to-run and are indefensible). A /flush between repeats bumps
    # the registry generation — plan cache AND cut-independent join
    # templates drop — so every repeat is a genuine restarted-server cold
    # pass, not a template-warm rerun. Reported: the best run (min by p50)
    # plus every run's p50 and the box load average, so a loaded box is
    # visible in the artifact.
    def flush() -> None:
        with urllib.request.urlopen(base + "/flush", timeout=600) as r:
            r.read()

    cold_runs = []
    for rep in range(3):
        if rep:
            flush()
        cold_runs.append(run_pass("uncached_cold_plans", bust=True, tag=f"a{rep}"))
    cold = dict(min(cold_runs, key=lambda r: r["p50_sec"]))
    cold["p50_runs_sec"] = [r["p50_sec"] for r in cold_runs]
    cold["errors"] = sum(r["errors"] for r in cold_runs)
    steady = run_pass("uncached_steady", bust=True, tag="b")

    # identical-cold pass (r13): all clients fire the SAME never-seen URL
    # simultaneously — the single-flight scenario. Before the HTTP-level
    # coalesce, every duplicate paid its own execution serialized behind
    # AQE's final-plan monitor; now one leader executes and the rest are
    # served its captured body.
    # min-of-3: each repeat fires a DISTINCT never-seen (year, nocache)
    # literal, so the response cache and plan cache both miss while the
    # join template stays warm — the single-flight scenario, repeated,
    # without remeasuring cold plan builds (the cold pass above owns those)
    def ident_run(rep: int, year: int) -> dict:
        ident_url = (
            base + shapes[0].format(y=year) + f"&nocache=identical-cold-{rep}"
        )

        def fetch_ident(_i: int) -> tuple[float, str | None]:
            start = time.perf_counter()
            try:
                with urllib.request.urlopen(ident_url, timeout=600) as r:
                    json.loads(r.read())
                return time.perf_counter() - start, None
            except Exception as e:  # noqa: BLE001
                return time.perf_counter() - start, f"{type(e).__name__}: {e}"[:120]

        wall0 = time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(max_workers=n_clients) as ex:
            results = list(ex.map(fetch_ident, range(n_clients)))
        wall = time.perf_counter() - wall0
        lat = sorted(t for t, _ in results)
        return {
            "pass": "identical_cold_single_flight",
            "clients": n_clients,
            "wall_sec": round(wall, 2),
            "throughput_rps": round(n_clients / wall, 1),
            "p50_sec": round(lat[len(lat) // 2], 3),
            "p95_sec": round(lat[int(len(lat) * 0.95)], 3),
            "max_sec": round(lat[-1], 3),
            "errors": sum(1 for _, e in results if e),
        }

    ident_runs = [ident_run(rep, y) for rep, y in enumerate((1998, 1999, 2000))]
    ident = dict(min(ident_runs, key=lambda r: r["p50_sec"]))
    ident["p50_runs_sec"] = [r["p50_sec"] for r in ident_runs]
    ident["errors"] = sum(r["errors"] for r in ident_runs)

    warm_seed = run_pass("cache_seed", bust=False)  # populates the LRU
    warm = run_pass("cached", bust=False)

    # restart-with-manifest pass (VERDICT r13 next-round #6): tear the
    # server down (flushing the recurring-shape manifest), boot a FRESH
    # PlanBuilder + server — empty plan cache and join templates, the
    # restarted-dashboard state — with warmup_manifest pointing at the
    # recorded file, wait for the async replay, then fire the same shape
    # mix cache-busted. With warmup the distinct-shape "cold" p50 on
    # manifest shapes should sit at steady-state, not at the cold pass's.
    srv.shutdown()
    srv.server_close()  # flushes the manifest
    builder2 = PlanBuilder(
        spark, testdata_schema(), testdata_registry(spark, sf_dir)
    )
    srv2 = make_server(
        builder2, port=0, logic_config=cfg, warmup_manifest=manifest_path
    )
    threading.Thread(target=srv2.serve_forever, daemon=True).start()
    state["base"] = f"http://127.0.0.1:{srv2.server_address[1]}"
    t_warm0 = time.perf_counter()
    warmed_ok = srv2.warmup_done.wait(600)
    restart = run_pass("restart_manifest_warm", bust=True, tag="w")
    restart["warmup_ok"] = bool(warmed_ok)
    restart["warmup_wall_sec"] = round(time.perf_counter() - t_warm0, 2)
    restart["cold_p50_ref"] = cold["p50_sec"]
    restart["steady_p50_ref"] = steady["p50_sec"]
    srv2.shutdown()
    try:
        os.unlink(manifest_path)
    except OSError:
        pass

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "load_avg": [round(x, 2) for x in os.getloadavg()],
                "passes": [cold, steady, ident, warm_seed, warm, restart],
            },
            indent=1,
        )
    )
    failed = any(
        p["errors"] for p in (cold, steady, ident, warm_seed, warm, restart)
    ) or not restart["warmup_ok"]
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
