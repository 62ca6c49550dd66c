"""Tripwire for driver-correctness-window starvation.

The driver's correctness harness oracle-checks only the first 50 ``queries()``
entries each round. Rounds 2-3 silently re-checked the same 50 and left the
45-entry LLM-pipeline surface with zero driver evidence (VERDICT r2, "What's
wrong" #2). These tests make that failure mode loud:

- every catalog entry must either already have a recorded driver row
  (CORRECTNESS_r*.json) or sit inside the explicit ``DRIVER_WINDOW`` rotation
  plan for the next run;
- the window itself must be well-formed (<= 50 names, all resolvable, no
  duplicates) and must lead the ``queries()`` ordering so the driver actually
  sees it.
"""

from __future__ import annotations

import glob
import json
import os

from tesseract_spark import catalog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _recorded_rows() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            names.update(json.load(f).keys())
    return names


def test_window_well_formed():
    assert len(catalog.DRIVER_WINDOW) <= 50, "driver checks only 50 entries"
    assert len(set(catalog.DRIVER_WINDOW)) == len(catalog.DRIVER_WINDOW)
    unknown = [n for n in catalog.DRIVER_WINDOW if n not in catalog.ENTRIES]
    assert not unknown, f"window names missing from catalog: {unknown}"


def test_window_leads_queries_order():
    order = list(catalog.queries())
    in_window = [n for n in catalog.DRIVER_WINDOW if n in catalog.ENTRIES]
    assert order[: len(in_window)] == in_window


def test_no_entry_starved():
    """Every entry has driver evidence, or is scheduled in the next window."""
    covered = _recorded_rows() | set(catalog.DRIVER_WINDOW)
    starved = [n for n in catalog.ENTRIES if n not in covered]
    assert not starved, (
        f"{len(starved)} entries have no driver-correctness row and are not in "
        f"DRIVER_WINDOW — rotate them in: {starved}"
    )


def test_failed_rows_stay_in_window():
    """A hash-failed driver row must be re-proven, not rotated away."""
    latest = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))[-1]
    with open(latest) as f:
        rows = json.load(f)
    failed = [
        n
        for n, r in rows.items()
        if not (r.get("rows_match") and r.get("schema_match") and r.get("hash_match"))
        and r.get("err") is None
    ]
    missing = [n for n in failed if n in catalog.ENTRIES and n not in catalog.DRIVER_WINDOW]
    assert not missing, f"failed driver rows rotated out of the window: {missing}"
