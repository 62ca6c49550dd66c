"""Result serialization: CSV / JSON-records / JSON-arrays, buffered or streamed.

Mirrors the reference's formatter surface (tesseract-core/src/format.rs:12-257
and format_stream.rs:14-378): the ``data`` envelope for JSON formats, nulls as
empty CSV fields / JSON ``null``, and an optional ``source`` metadata block.

Streaming here = the reference's chunked-HTTP behavior (SURVEY.md §2.8):
``toLocalIterator`` pulls one partition at a time to the driver so the full
result never materializes driver-side — the Spark analog of per-block
serialization. For truly huge exports use ``df.write.csv/json`` straight from
executors instead (``write_distributed``).
"""

from __future__ import annotations

import csv
import io
import json
import math
from collections.abc import Iterator

from pyspark.sql import DataFrame


def _clean(v):
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return None
    return v


def _row_values(row, columns):
    return [_clean(row[c]) for c in columns]


def format_csv_stream(df: DataFrame) -> Iterator[str]:
    """Header + rows, incrementally (format.rs:47-94 semantics: null → empty)."""
    columns = df.columns
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerow(columns)
    yield buf.getvalue()
    for row in df.toLocalIterator():
        buf = io.StringIO()
        w = csv.writer(buf, lineterminator="\n")
        w.writerow(["" if v is None else v for v in _row_values(row, columns)])
        yield buf.getvalue()


def format_csv(df: DataFrame) -> str:
    return "".join(format_csv_stream(df))


def _json_default(v):
    # timestamps/dates/decimals → ISO strings / floats
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ")
    return str(v)


def format_jsonrecords_stream(df: DataFrame, source: dict | None = None) -> Iterator[str]:
    """``{"data": [...]}`` with one object per row (format.rs:97-148), emitted
    incrementally (format_stream.rs equivalent)."""
    columns = df.columns
    yield '{"data":['
    first = True
    for row in df.toLocalIterator():
        rec = dict(zip(columns, _row_values(row, columns)))
        chunk = json.dumps(rec, default=_json_default)
        yield chunk if first else "," + chunk
        first = False
    if source is not None:
        yield '],"source":' + json.dumps(source, default=_json_default) + "}"
    else:
        yield "]}"


def format_jsonrecords(df: DataFrame, source: dict | None = None) -> str:
    return "".join(format_jsonrecords_stream(df, source))


def format_jsonarrays_stream(df: DataFrame, source: dict | None = None) -> Iterator[str]:
    """``{"headers": [...], "data": [[...], ...]}`` (format.rs:151-172)."""
    columns = df.columns
    yield '{"headers":' + json.dumps(columns) + ',"data":['
    first = True
    for row in df.toLocalIterator():
        chunk = json.dumps(_row_values(row, columns), default=_json_default)
        yield chunk if first else "," + chunk
        first = False
    if source is not None:
        yield '],"source":' + json.dumps(source, default=_json_default) + "}"
    else:
        yield "]}"


def format_jsonarrays(df: DataFrame, source: dict | None = None) -> str:
    return "".join(format_jsonarrays_stream(df, source))


class LocalRows:
    """Driver-side stand-in for a DataFrame in the formatters: ``columns`` +
    ``toLocalIterator()`` over already-materialized dict rows. Lets small
    in-memory tables (``/relations`` output, cached member lists — bounded by
    construction) go through the SAME csv/jsonrecords/jsonarrays streamers as
    query results, matching the reference where ``/relations.{format}`` runs
    through ``format_records`` like any aggregate
    (handlers/logic_layer/relations.rs:157-167)."""

    def __init__(self, columns: list[str], rows: list[dict]):
        self.columns = list(columns)
        self._rows = rows

    def toLocalIterator(self):  # noqa: N802 — DataFrame-API name
        return iter(self._rows)


FORMATTERS = {
    "csv": format_csv,
    "jsonrecords": format_jsonrecords,
    "jsonarrays": format_jsonarrays,
}

STREAM_FORMATTERS = {
    "csv": format_csv_stream,
    "jsonrecords": format_jsonrecords_stream,
    "jsonarrays": format_jsonarrays_stream,
}


def format_records(df: DataFrame, fmt: str, source: dict | None = None) -> str:
    try:
        f = FORMATTERS[fmt]
    except KeyError:
        raise ValueError(f"unknown format {fmt!r}; choose from {sorted(FORMATTERS)}")
    return f(df) if fmt == "csv" else f(df, source)


def write_distributed(df: DataFrame, path: str, fmt: str = "csv") -> None:
    """Executor-side export for results too large for the driver (the 100 TB
    path the reference cannot take — it always marshals through the server)."""
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt in ("json", "jsonrecords"):
        writer.json(path)
    else:
        raise ValueError(f"unknown distributed format {fmt!r}")
