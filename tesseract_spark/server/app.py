"""Thin HTTP façade over the engine (stdlib-only; the reference uses actix-web).

Endpoints (tesseract-server/src/app.rs route table):

- ``GET /cubes`` / ``GET /cubes/{cube}`` — metadata
- ``GET /cubes/{cube}/aggregate.{csv|jsonrecords|jsonarrays}?drilldowns=..&measures=..&cuts=..``
- ``GET /data.{fmt}?cube=..&drilldowns=Year&measures=Quantity&Year=2017`` — logic layer
- ``GET /cubes/{cube}/members.{fmt}?level=Dim.Hier.Level``
- ``GET /cubes/{cube}/diagnosis`` — orphan FK / duplicate key counts
- ``GET /flush?secret=..`` — re-create the plan builder (schema hot reload)

Responses stream chunk-by-chunk via the formatters' ``toLocalIterator`` path —
the reference's chunked-transfer behavior (format_stream.rs; SURVEY.md §2.8).
Concurrency: ThreadingHTTPServer + Spark's thread-safe SparkSession; Spark
schedules concurrent jobs FIFO across its executor pool, the engine-level
analog of the reference's ~100-concurrent-request target (DESIGN.md).
"""

from __future__ import annotations

import json
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from ..formats.format import STREAM_FORMATTERS
from ..logic.layer import LogicLayer, LogicLayerConfig
from ..metadata import cube_metadata, diagnosis_dfs, members_df, schema_metadata
from ..plans.builder import PlanBuilder
from ..query.model import Query

_CONTENT_TYPES = {
    "csv": "text/csv",
    "jsonrecords": "application/json",
    "jsonarrays": "application/json",
}


def _single_params(qs: dict[str, list[str]]) -> dict[str, str]:
    return {k: v[-1] for k, v in qs.items()}


class EngineHandler(BaseHTTPRequestHandler):
    # injected by make_server:
    builder: PlanBuilder = None
    logic: LogicLayer = None
    flush_secret: str | None = None

    def log_message(self, fmt, *args):  # quiet
        pass

    def _send_json(self, obj, status: int = 200):
        body = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _stream_df(self, df, fmt: str):
        try:
            formatter = STREAM_FORMATTERS[fmt]
        except KeyError:
            return self._send_json({"error": f"unknown format {fmt!r}"}, 400)
        self.send_response(200)
        self.send_header("Content-Type", _CONTENT_TYPES[fmt])
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()
        for chunk in formatter(df):
            data = chunk.encode()
            if not data:
                continue
            self.wfile.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")
        self.wfile.write(b"0\r\n\r\n")

    def do_GET(self):
        try:
            self._route()
        except Exception as e:  # error envelope (format.rs error body)
            traceback.print_exc()
            self._send_json({"error": str(e)}, 400)

    def _route(self):
        url = urlparse(self.path)
        qs = parse_qs(url.query)
        params = _single_params(qs)
        parts = [p for p in url.path.split("/") if p]

        if parts == ["cubes"]:
            return self._send_json(schema_metadata(self.builder.schema))

        if len(parts) == 2 and parts[0] == "cubes":
            return self._send_json(cube_metadata(self.builder.schema.cube(parts[1])))

        if len(parts) == 3 and parts[0] == "cubes":
            cube = parts[1]
            endpoint, _, fmt = parts[2].partition(".")
            fmt = fmt or "jsonrecords"
            if endpoint == "aggregate":
                # repeated params arrive as lists (drilldowns, cuts, measures…)
                agg_params = {k: (v if len(v) > 1 else v[0]) for k, v in qs.items()}
                q = Query.from_params(agg_params)
                df = self.builder.dataframe(cube, q)
                return self._stream_df(df, fmt)
            if endpoint == "members":
                df = members_df(self.builder, cube, params["level"])
                return self._stream_df(df, fmt)
            if endpoint == "diagnosis":
                counts = {
                    name: df.count()
                    for name, df in diagnosis_dfs(self.builder, cube).items()
                }
                return self._send_json({"issues": counts})

        if parts and parts[0].startswith("data"):
            _, _, fmt = parts[0].partition(".")
            df = self.logic.data(params)
            return self._stream_df(df, fmt or "jsonrecords")

        if parts == ["flush"]:
            if self.flush_secret and params.get("secret") != self.flush_secret:
                return self._send_json({"error": "bad secret"}, 403)
            type(self).logic = LogicLayer(self.builder, self.logic.config)
            return self._send_json({"flushed": True})

        self._send_json({"error": f"no route for {url.path}"}, 404)


def make_server(
    builder: PlanBuilder,
    host: str = "127.0.0.1",
    port: int = 7777,
    logic_config: LogicLayerConfig | None = None,
    flush_secret: str | None = None,
) -> ThreadingHTTPServer:
    handler = type(
        "BoundEngineHandler",
        (EngineHandler,),
        {
            "builder": builder,
            "logic": LogicLayer(builder, logic_config),
            "flush_secret": flush_secret,
        },
    )
    return ThreadingHTTPServer((host, port), handler)
