"""Geoservice integration for geo-typed dimensions.

The reference resolves ``neighbors``/``children``/``parents`` cut operations on
``type=geo`` dimensions through an external HTTP geoservice and inlines the
returned IDs into the cut
(tesseract-server/src/handlers/logic_layer/geoservice.rs:29-74). Same contract
here: a pluggable :class:`GeoService`; the engine ships

- :class:`HttpGeoService` — calls ``{base}/{relation}/{id}`` expecting a JSON
  list of IDs (stdlib urllib; no external deps), and
- the default fallback: the member cache's order-based relations
  (logic/cache.py), used when no geoservice is configured.
"""

from __future__ import annotations

import json
import urllib.request
from typing import Protocol


class GeoService(Protocol):
    def relate(self, relation: str, member) -> list:  # relation ∈ neighbors/children/parents
        ...


class HttpGeoService:
    def __init__(self, base_url: str, timeout: float = 10.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def relate(self, relation: str, member) -> list:
        if relation not in ("neighbors", "children", "parents"):
            raise ValueError(f"unknown geoservice relation {relation!r}")
        url = f"{self.base_url}/{relation}/{member}"
        with urllib.request.urlopen(url, timeout=self.timeout) as r:
            payload = json.loads(r.read())
        # accept either a bare list or {"ids": [...]}
        return payload["ids"] if isinstance(payload, dict) else list(payload)
