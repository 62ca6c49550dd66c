"""HTTP façade + formatter tests (the reference's e2e shape:
tests/src/clickhouse_end_to_end.rs — boot server, assert body)."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest


@pytest.fixture(scope="module")
def server(builder):
    from tesseract_spark.logic.layer import LogicLayerConfig
    from tesseract_spark.server.app import make_server

    cfg = LogicLayerConfig.from_json(
        {"cubes": [{"name": "lineitem_sales", "alternatives": ["sales"]}]}
    )
    srv = make_server(builder, port=0, logic_config=cfg)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url: str) -> bytes:
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.read()


def test_index_status_route(server):
    """`/` health check (handlers/index.rs:13-21 parity): status + version."""
    body = json.loads(_get(f"{server}/"))
    assert body["status"] == "ok"
    import tesseract_spark

    assert body["tesseract_version"] == tesseract_spark.__version__


def test_cubes_metadata(server):
    meta = json.loads(_get(f"{server}/cubes"))
    names = {c["name"] for c in meta["cubes"]}
    assert {"lineitem_sales", "orders_sales"} <= names


def test_aggregate_jsonrecords(server):
    body = json.loads(
        _get(
            f"{server}/cubes/lineitem_sales/aggregate.jsonrecords"
            "?drilldowns=Ship+Date.Year&measures=Quantity"
        )
    )
    rows = body["data"]
    assert len(rows) >= 5 and {"Year", "Quantity"} <= set(rows[0])


def test_aggregate_sort_none_param(server):
    """sort=none over the wire: same rows as the default-ordered response,
    order-free (round 7 — the sink-consumer toggle must be reachable
    through the HTTP surface, not just the library)."""
    base = (
        f"{server}/cubes/lineitem_sales/aggregate.jsonrecords"
        "?drilldowns=Part.Brand&measures=Quantity"
    )
    ordered = json.loads(_get(base))["data"]
    unordered = json.loads(_get(base + "&sort=none"))["data"]
    key = lambda r: (r["Brand"], r["Quantity"])  # noqa: E731
    assert sorted(unordered, key=key) == sorted(ordered, key=key)
    assert len(ordered) > 1


def test_aggregate_csv_stream(server):
    text = _get(
        f"{server}/cubes/lineitem_sales/aggregate.csv"
        "?drilldowns=Return+Flag.Return+Flag&measures=Quantity"
    ).decode()
    lines = text.strip().splitlines()
    assert lines[0] == "Return Flag,Quantity" and len(lines) == 4


def test_logic_layer_endpoint(server):
    # the reference's canonical e2e query shape (clickhouse_end_to_end.rs:205-214)
    body = json.loads(
        _get(f"{server}/data.jsonrecords?cube=sales&drilldowns=Year&measures=Quantity")
    )
    assert all({"Year", "Quantity"} <= set(r) for r in body["data"])


def test_members_endpoint(server):
    body = json.loads(
        _get(
            f"{server}/cubes/lineitem_sales/members.jsonrecords"
            "?level=Customer+Geography.Geography.Region"
        )
    )
    assert len(body["data"]) == 5


def test_diagnosis_endpoint(server):
    body = json.loads(_get(f"{server}/cubes/lineitem_sales/diagnosis"))
    assert body["issues"] and all(v == 0 for v in body["issues"].values())


def test_response_cache(server):
    url = (
        f"{server}/cubes/lineitem_sales/aggregate.jsonrecords"
        "?drilldowns=Ship+Date.Year&measures=Max+Tax"
    )
    first = _get(url)
    # second hit must be served from cache with identical body
    req = urllib.request.Request(url)
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers.get("X-Cache") == "hit"
        assert r.read() == first


def test_relations_endpoint(server):
    body = json.loads(
        _get(
            f"{server}/relations?cube=lineitem_sales"
            "&level=Customer+Geography.Geography.Nation&member=7"
        )
    )
    rels = {r["relation"] for r in body["data"]}
    assert rels == {"parent", "neighbor"}


def test_relations_formats(server):
    """/relations.{fmt} streams through the same csv/jsonarrays formatters as
    aggregates (relations.rs:157-167 runs relations through format_records)."""
    base = (
        "cube=lineitem_sales"
        "&level=Customer+Geography.Geography.Nation&member=7"
    )
    text = _get(f"{server}/relations.csv?{base}").decode()
    lines = text.strip().split("\n")
    assert lines[0] == "relation,level,id,of"
    assert any(line.startswith("parent,") for line in lines[1:])

    arrays = json.loads(_get(f"{server}/relations.jsonarrays?{base}"))
    assert arrays["headers"] == ["relation", "level", "id", "of"]
    # same row multiset as the default jsonrecords envelope
    records = json.loads(_get(f"{server}/relations?{base}"))["data"]
    as_rows = sorted([r["relation"], r["level"], r["id"], r["of"]] for r in records)
    assert sorted(arrays["data"]) == as_rows


def test_concurrent_requests(server):
    """The reference's design target is ~100 concurrent requests
    (DESIGN.md:1-5); fire 100 aggregate queries from 100 simultaneous client
    threads across distinct cuts — all must return correct, independent
    results with zero errors (ThreadingHTTPServer + thread-safe SparkSession,
    jobs FIFO-scheduled over the executor pool). The measured sf0.1
    throughput/latency figure comes from scripts/concurrency_probe.py
    (recorded in ROUND_NOTES.md); this gate pins the behavior at test SF."""
    import concurrent.futures

    years = [1995, 1996, 1997, 1998, 1999, 2000] * 17  # 102 requests

    def fetch(i_year):
        i, year = i_year
        body = json.loads(
            _get(
                f"{server}/data.jsonrecords?cube=sales&drilldowns=Year"
                f"&measures=Quantity&Year={year}&nocache={i}"
            )
        )
        return year, body["data"]

    with concurrent.futures.ThreadPoolExecutor(max_workers=100) as ex:
        results = list(ex.map(fetch, enumerate(years)))
    assert len(results) == len(years)
    for year, rows in results:
        assert len(rows) == 1 and rows[0]["Year"] == year, (year, rows)


def test_flush_concurrent_with_queries(server):
    """ADVICE r11 (medium): refresh_files() iterated _parquet_memo while
    request threads mutate it via load()'s memoization — /flush racing GETs
    intermittently raised 'Set changed size during iteration'. The registry
    now locks the memo/generation bookkeeping; hammer /flush from one
    thread while 40 query threads keep re-populating the memo, and every
    response (both kinds) must be a 200 with correct content."""
    import concurrent.futures

    def query(i):
        year = 1995 + (i % 6)
        body = json.loads(
            _get(
                f"{server}/data.jsonrecords?cube=sales&drilldowns=Year"
                f"&measures=Quantity&Year={year}&nocache=f{i}"
            )
        )
        assert body["data"][0]["Year"] == year
        return "q"

    def flush(i):
        assert json.loads(_get(f"{server}/flush")) == {"flushed": True}
        return "f"

    jobs = [(flush if i % 5 == 0 else query) for i in range(40)]
    with concurrent.futures.ThreadPoolExecutor(max_workers=40) as ex:
        results = list(ex.map(lambda t: t[0](t[1]), zip(jobs, range(40))))
    assert results.count("f") == 8 and results.count("q") == 32


def test_auth_levels(spark, sf_dir):
    """min_auth_level gating (auth.rs contract): unauthenticated sees only
    public cubes; a signed token with sufficient level unlocks the rest."""
    import urllib.error

    from tesseract_spark.plans.builder import PlanBuilder
    from tesseract_spark.schema.parse import schema_from_json
    from tesseract_spark.server.app import make_server
    from tesseract_spark.server.auth import sign_token
    from tesseract_spark.sources.registry import testdata_registry

    schema = schema_from_json(
        {
            "name": "authed",
            "cubes": [
                {
                    "name": "secret_orders",
                    "min_auth_level": 5,
                    "table": {"name": "orders"},
                    "dimensions": [
                        {
                            "name": "Status",
                            "foreign_key": None,
                            "hierarchies": [
                                {
                                    "name": "Status",
                                    "levels": [
                                        {
                                            "name": "Status",
                                            "key_column": "o_orderstatus",
                                            "key_type": "text",
                                        }
                                    ],
                                }
                            ],
                        }
                    ],
                    "measures": [
                        {"name": "Total", "column": "o_totalprice", "aggregator": "sum"}
                    ],
                }
            ],
        }
    )
    b = PlanBuilder(spark, schema, testdata_registry(spark, sf_dir))
    srv = make_server(b, port=0, jwt_secret="s3cret")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # anonymous: cube hidden from listing, direct access 401
        meta = json.loads(_get(f"{base}/cubes"))
        assert meta["cubes"] == []
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(f"{base}/cubes/secret_orders/aggregate.jsonrecords"
                 "?drilldowns=Status.Status&measures=Total")
        assert e.value.code == 401
        # forged token rejected
        with pytest.raises(urllib.error.HTTPError):
            _get(f"{base}/cubes/secret_orders?token=abc.def")
        # valid token at sufficient level
        tok = sign_token("s3cret", 7)
        body = json.loads(
            _get(
                f"{base}/cubes/secret_orders/aggregate.jsonrecords"
                f"?drilldowns=Status.Status&measures=Total&token={tok}"
            )
        )
        assert len(body["data"]) == 3
        # valid token at insufficient level
        low = sign_token("s3cret", 2)
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(f"{base}/cubes/secret_orders?token={low}")
        assert e.value.code == 401
    finally:
        srv.shutdown()


def test_jsonarrays_format(spark, sf_dir):
    from tesseract_spark import catalog
    from tesseract_spark.formats.format import format_jsonarrays

    df = catalog.ENTRIES["q_cut_exclude"].spark_fn(spark, sf_dir)
    body = json.loads(format_jsonarrays(df, source={"name": "lineitem_sales"}))
    assert body["headers"] == ["Return Flag", "Quantity"]
    assert body["source"]["name"] == "lineitem_sales"
    assert len(body["data"]) == 2


def test_aggregate_explain_returns_plan_text(server):
    """`?explain=true` returns the formatted Spark plan instead of data —
    the Spark-native ops surface for checking pushdown/broadcast shape
    over HTTP (no reference counterpart; its debug flag only logs SQL
    server-side)."""
    body = _get(
        f"{server}/cubes/lineitem_sales/aggregate.jsonrecords"
        "?drilldowns=Part.Brand&measures=Extended+Price&explain=true"
    ).decode()
    assert "== Physical Plan ==" in body
    # the dim join must show as a broadcast in the served plan
    assert "BroadcastHashJoin" in body
    # and the same URL without the flag still serves data
    rows = json.loads(
        _get(
            f"{server}/cubes/lineitem_sales/aggregate.jsonrecords"
            "?drilldowns=Part.Brand&measures=Extended+Price"
        )
    )["data"]
    assert len(rows) > 0


def test_drillthrough_route(server):
    """`/cubes/{cube}/drillthrough.jsonrecords` pages the fact rows behind
    a cell, labeled with drill columns, capped by `limit`."""
    body = json.loads(
        _get(
            f"{server}/cubes/lineitem_sales/drillthrough.jsonrecords"
            "?drilldowns=Return+Flag.Return+Flag&measures=Extended+Price"
            "&cuts=Return+Flag.Return+Flag.R&limit=7"
        )
    )
    rows = body["data"]
    assert len(rows) == 7
    assert set(rows[0]) == {"Return Flag", "Extended Price"}
    assert all(r["Return Flag"] == "R" for r in rows)


def test_logic_layer_members_route_unique_names(server):
    """Logic-layer `/members?cube=&level=` resolves the cube alias and the
    UNIQUE level name (no Dim.Hier.Level qualification) and streams through
    the formatters (app.rs:166-169)."""
    body = json.loads(
        _get(f"{server}/members.jsonrecords?cube=sales&level=Region")
    )
    labels = {r["Label"] for r in body["data"]}
    assert "AMERICA" in labels and len(body["data"]) == 5
    # csv through the same route
    csv_head = (
        _get(f"{server}/members.csv?cube=sales&level=Region")
        .decode()
        .splitlines()[0]
    )
    assert csv_head == "ID,Label"


def test_global_diagnosis_route(server):
    """Global `/diagnosis[.fmt]` sweeps every visible cube, one row per
    issue (diagnosis.rs:80-125); the fixture schema is clean, so the sweep
    returns an empty, well-formed table, and ?cube= filtering 404s on an
    unknown cube."""
    body = json.loads(_get(f"{server}/diagnosis"))
    assert body["data"] == []
    csv_bytes = _get(f"{server}/diagnosis.csv")
    assert csv_bytes.decode().splitlines()[0] == "cube,error_type,error_message"
    import urllib.error

    try:
        _get(f"{server}/diagnosis?cube=nope")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_server_listen_backlog_admits_concurrent_burst(builder):
    """socketserver's default backlog of 5 drops simultaneous SYNs under
    the ~100-concurrent design target; the overflow retransmits after
    1s/2s, showing up as a cached-response p50 of ~1 s (round-9 probe).
    Pin the structural fix."""
    from tesseract_spark.server.app import make_server

    srv = make_server(builder, port=0)
    try:
        assert srv.request_queue_size >= 100
        assert srv.daemon_threads
    finally:
        srv.server_close()


def test_single_flight_coalesces_identical_inflight_requests(builder):
    """VERDICT r12 #3: N identical cold requests must share ONE engine
    execution — followers are served the leader's captured body before the
    response cache has ever seen the key. Distinct queries still execute."""
    import time

    from tesseract_spark.server.app import make_server

    class CountingEngine:
        def __init__(self, inner):
            self.inner = inner
            self.calls = 0
            self._lock = threading.Lock()

        def dataframe(self, cube, q):
            with self._lock:
                self.calls += 1
            time.sleep(1.0)  # hold the flight open so followers overlap
            return self.inner.dataframe(cube, q)

    eng = CountingEngine(builder)
    srv = make_server(builder, port=0, navigator=eng)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        url = (
            base + "/cubes/lineitem_sales/aggregate.jsonrecords"
            "?drilldowns=Return+Flag.Return+Flag&measures=Quantity"
        )
        bodies: list[bytes | None] = [None] * 3
        tags: list[str | None] = [None] * 3

        def fetch(i: int) -> None:
            with urllib.request.urlopen(url, timeout=120) as r:
                bodies[i] = r.read()
                tags[i] = r.headers.get("X-Cache")

        threads = [threading.Thread(target=fetch, args=(i,)) for i in range(3)]
        for x in threads:
            x.start()
        for x in threads:
            x.join()
        assert eng.calls == 1, f"expected one shared execution, got {eng.calls}"
        assert bodies[0] == bodies[1] == bodies[2] and bodies[0]
        assert [tag for tag in tags if tag == "coalesced"] == ["coalesced"] * 2
        # a different query is a different flight
        with urllib.request.urlopen(url + "&limit=2", timeout=120) as r:
            r.read()
        assert eng.calls == 2
    finally:
        srv.shutdown()


def test_single_flight_stale_leader_reclaimed():
    """ADVICE r13: a leader that dies between begin() and its try/finally
    must not poison the key forever — begin() reclaims leadership once the
    existing flight is older than wait_timeout, instead of every future
    identical request blocking the full timeout."""
    import time

    from tesseract_spark.server.app import _SingleFlight

    sf = _SingleFlight(wait_timeout=0.05)
    leader, _ = sf.begin("k")
    assert leader
    # leader dies silently (no done()); a fresh caller after the timeout
    # must become the NEW leader immediately, not block
    time.sleep(0.06)
    t0 = time.monotonic()
    leader2, _ = sf.begin("k")
    assert leader2 and time.monotonic() - t0 < 0.05
    sf.done("k", ("text/csv", b"body"))
    # the key is clean again: next caller leads a fresh flight
    leader3, _ = sf.begin("k")
    assert leader3
    sf.done("k", None)


def test_single_flight_live_leader_still_coalesces():
    """Reclaim must not break the normal path: a live leader within the
    timeout window still hands followers its published result."""
    import time

    from tesseract_spark.server.app import _SingleFlight

    sf = _SingleFlight(wait_timeout=5.0)
    leader, _ = sf.begin("k")
    assert leader
    got = []

    def follow():
        got.append(sf.begin("k"))

    th = threading.Thread(target=follow)
    th.start()
    time.sleep(0.05)
    sf.done("k", ("text/csv", b"shared"))
    th.join(timeout=5)
    assert got == [(False, ("text/csv", b"shared"))]


def test_warmup_manifest_replays_recurring_shapes(builder, tmp_path):
    """r14 (VERDICT r13 next-round #6): served /aggregate URIs are counted
    into a bounded manifest; a RESTARTED server replays the recorded
    shapes through the real HTTP path before the first real request —
    pre-executing each one (engine-call proof) and never re-recording the
    replays themselves."""
    import json as _json
    import time
    import urllib.request

    from tesseract_spark.server.app import make_server

    manifest = str(tmp_path / "warmup.json")
    srv1 = make_server(builder, port=0, warmup_manifest=manifest)
    threading.Thread(target=srv1.serve_forever, daemon=True).start()
    assert srv1.warmup_done.wait(5)  # empty manifest -> set immediately
    base = f"http://127.0.0.1:{srv1.server_address[1]}"
    shape_a = "/cubes/lineitem_sales/aggregate.jsonrecords?drilldowns=Return+Flag.Return+Flag&measures=Quantity"
    shape_b = "/cubes/lineitem_sales/aggregate.jsonrecords?drilldowns=Ship+Date.Year&measures=Quantity"
    for url in (shape_a, shape_a, shape_b):
        with urllib.request.urlopen(base + url, timeout=120) as r:
            r.read()
    srv1.shutdown()
    srv1.server_close()  # flush deferred manifest writes
    data = _json.load(open(manifest))
    assert data["uris"].get(shape_a) == 2 and data["uris"].get(shape_b) == 1

    # "restarted" server: same session, fresh engine-call counter in front
    class CountingEngine:
        def __init__(self, inner):
            self.inner = inner
            self.calls = []

        def dataframe(self, cube, q):
            self.calls.append(cube)
            return self.inner.dataframe(cube, q)

    eng = CountingEngine(builder)
    srv2 = make_server(builder, port=0, navigator=eng, warmup_manifest=manifest)
    threading.Thread(target=srv2.serve_forever, daemon=True).start()
    try:
        assert srv2.warmup_done.wait(120), "warmup never completed"
        assert len(eng.calls) == 2, eng.calls  # both shapes pre-executed
        # warmup replays must NOT be re-recorded (X-Warmup header)
        assert srv2.RequestHandlerClass.manifest._counts == {
            shape_a: 2,
            shape_b: 1,
        }
        # a real request for a warmed shape is served from the seeded
        # response cache — no further engine execution
        base2 = f"http://127.0.0.1:{srv2.server_address[1]}"
        with urllib.request.urlopen(base2 + shape_a, timeout=120) as r:
            r.read()
            assert r.headers.get("X-Cache") == "hit"
        assert len(eng.calls) == 2
        # ...and IS recorded as regular traffic
        time.sleep(0)
        assert srv2.RequestHandlerClass.manifest._counts[shape_a] == 3
    finally:
        srv2.shutdown()
        srv2.server_close()


def test_warmup_manifest_sanitizes_tokens_and_bounds_memory(tmp_path):
    """r14 review: bearer tokens must never reach the manifest file, and
    the in-memory counter must not grow one entry per distinct URI."""
    from tesseract_spark.server.app import _WarmupManifest

    s = _WarmupManifest.sanitize
    assert s("/data.csv?cube=s&token=SECRET&Year=1997") == "/data.csv?cube=s&Year=1997"
    assert s("/data.csv?token=SECRET") == "/data.csv"
    assert s("/data.csv?cube=s") == "/data.csv?cube=s"
    assert s("/cubes") == "/cubes"

    m = _WarmupManifest(str(tmp_path / "m.json"), top_n=4)
    m.record("/data.csv?cube=s&token=tok-abc")
    assert list(m._counts) == ["/data.csv?cube=s"]
    # popular shape + a flood of one-off cache-busted URIs
    for _ in range(5):
        m.record("/agg?shape=hot")
    for i in range(500):
        m.record(f"/agg?shape=cold&nocache={i}")
    assert len(m._counts) <= 16 * m.top_n
    assert m._counts["/agg?shape=hot"] == 5  # eviction keeps the popular one
    assert m.top()[0] == "/agg?shape=hot"


def test_single_flight_reclaim_releases_followers():
    """r15 (VERDICT r14 'what's wrong' #2): when a NEW caller reclaims a
    dead leader's key, the dead flight's already-blocked followers must be
    released IMMEDIATELY (result None → independent-execution fallback),
    not left waiting out their own full wait_timeout on the abandoned
    event."""
    import time

    from tesseract_spark.server.app import _SingleFlight

    # wait_timeout large enough that a follower who is NOT released would
    # visibly stall; reclaim eligibility is driven by the flight's age, so
    # monkeypatch the dead flight's start stamp backwards instead of
    # sleeping the timeout out
    sf = _SingleFlight(wait_timeout=30.0)
    leader, _ = sf.begin("k")
    assert leader

    got: list[tuple] = []

    def follow():
        got.append(sf.begin("k"))

    th = threading.Thread(target=follow)
    th.start()
    time.sleep(0.1)  # follower is now blocked on the live flight's event
    assert not got
    # leader dies without done(); age the flight past the timeout AFTER the
    # follower is already parked on its event (the pre-fix behavior left
    # exactly this follower stalling out its own full wait_timeout)
    sf._inflight["k"].started -= 31.0
    t0 = time.monotonic()
    leader2, _ = sf.begin("k")  # reclaim — must fire the old event
    assert leader2
    th.join(timeout=5)
    elapsed = time.monotonic() - t0
    assert got == [(False, None)], got  # fallback, not a served result
    assert elapsed < 1.0, f"follower stalled {elapsed:.1f}s after reclaim"
    sf.done("k", None)


def test_warmup_manifest_persist_is_concurrency_safe(tmp_path):
    """ADVICE r14 #3: concurrent record()/flush() writers used one fixed
    '{path}.tmp' outside the lock — interleaved writes could os.replace a
    corrupt manifest. _persist now uses a unique mkstemp per writer: under
    a 16-thread write storm the manifest must always load as valid JSON
    with an intact top shape, and no orphan tmp files may survive."""
    import json as _json
    import os

    from tesseract_spark.server.app import _WarmupManifest

    path = str(tmp_path / "m.json")
    m = _WarmupManifest(path, top_n=4)
    m._counts = {"/agg?shape=hot": 99, "/agg?shape=warm": 5}

    def storm():
        for _ in range(50):
            m.flush()

    threads = [threading.Thread(target=storm) for _ in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    data = _json.load(open(path))  # valid JSON despite 800 racing writers
    assert data["uris"] == {"/agg?shape=hot": 99, "/agg?shape=warm": 5}
    leftovers = [f for f in os.listdir(tmp_path) if f != "m.json"]
    assert leftovers == [], leftovers


def test_warmup_manifest_warms_plan_templates(builder, tmp_path):
    """r15 (VERDICT r14 next-round #7, standing-suite promotion of the
    restart_manifest_warm probe): a warmup-replayed shape must warm the
    cut-independent JOIN TEMPLATE, so a post-restart request for the SAME
    drill shape with a DIFFERENT cut literal (response-cache miss by
    construction) is served off the warm template — template-cache hit,
    zero cold template builds."""
    import urllib.request

    from tesseract_spark.server.app import make_server

    manifest = str(tmp_path / "warmup.json")
    shape_97 = (
        "/cubes/lineitem_sales/aggregate.jsonrecords"
        "?drilldowns=Part.Brand&measures=Quantity"
        "&cuts=Ship+Date.Ship+Date.Year.1997"
    )
    srv1 = make_server(builder, port=0, warmup_manifest=manifest)
    threading.Thread(target=srv1.serve_forever, daemon=True).start()
    assert srv1.warmup_done.wait(5)
    base = f"http://127.0.0.1:{srv1.server_address[1]}"
    with urllib.request.urlopen(base + shape_97, timeout=120) as r:
        r.read()
    srv1.shutdown()
    srv1.server_close()  # flush the manifest

    # fresh-builder restart: same session, but plan/template caches empty
    # like a restarted server's would be
    import tesseract_spark

    builder2 = tesseract_spark.PlanBuilder(
        builder.spark, builder.schema, builder.registry
    )
    srv2 = make_server(builder2, port=0, warmup_manifest=manifest)
    threading.Thread(target=srv2.serve_forever, daemon=True).start()
    try:
        assert srv2.warmup_done.wait(120), "warmup never completed"
        hits_before = builder2.template_cache_hits
        misses_before = builder2.template_cache_misses
        assert misses_before >= 1  # the replay itself built the template
        base2 = f"http://127.0.0.1:{srv2.server_address[1]}"
        shape_98 = shape_97.replace("Year.1997", "Year.1998")
        with urllib.request.urlopen(base2 + shape_98, timeout=120) as r:
            assert r.read()
            assert r.headers.get("X-Cache") != "hit"  # different literal
        assert builder2.template_cache_hits == hits_before + 1
        assert builder2.template_cache_misses == misses_before, (
            "post-warmup request paid a cold template build"
        )
    finally:
        srv2.shutdown()
        srv2.server_close()
