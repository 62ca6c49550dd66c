"""Doc-drift guards (VERDICT r11 'What's wrong #2').

The verify skill (.claude/skills/verify/SKILL.md) documents the session
defaults a future verifier will drive against; round 11 shipped a FIFO
scheduler default while the skill still said FAIR, sending the next
session's verifier chasing a phantom. These asserts read BOTH the doc and
the code so the pair can only change together.
"""

from __future__ import annotations

import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent
SKILL = REPO / ".claude" / "skills" / "verify" / "SKILL.md"
SESSION = REPO / "tesseract_spark" / "session.py"


def test_verify_skill_scheduler_line_matches_session_default():
    src = SESSION.read_text()
    m = re.search(
        r"os\.environ\.get\(\s*\"SPARK_GRAFT_SCHEDULER\",\s*\"(\w+)\"\s*\)", src
    )
    assert m, "session.py no longer reads SPARK_GRAFT_SCHEDULER — update this guard"
    default = m.group(1)
    assert default == "FIFO"

    skill = SKILL.read_text()
    # the skill must state the real default and must NOT claim FAIR is set
    assert f"`spark.scheduler.mode` defaults to {default}" in skill
    assert "`spark.scheduler.mode=FAIR` is set" not in skill


def test_verify_skill_documents_actual_get_spark_pins():
    """The semantic pins a verifier relies on (UTC + AQE + ANSI-off) must
    exist in get_spark exactly as the skill's gotchas describe."""
    src = SESSION.read_text()
    for key, val in [
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.ansi.enabled", "false"),
    ]:
        assert f'"{key}"' in src and f'"{val}"' in src, key
    skill = SKILL.read_text()
    assert "pins UTC + AQE" in skill
