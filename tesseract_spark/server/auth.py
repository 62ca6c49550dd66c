"""Auth-level enforcement (L11 analog).

The reference validates a JWT carrying an ``auth_level`` claim against each
cube's ``min_auth_level`` (tesseract-server/src/auth.rs:17-108, util.rs:71-85;
schema.rs:134,170). Same contract here with a stdlib HMAC-SHA256 signed token
(no external JWT dependency): ``base64url(json claims).hexsig``.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json


def sign_token(secret: str, auth_level: int, **claims) -> str:
    payload = dict(claims, auth_level=int(auth_level))
    body = base64.urlsafe_b64encode(json.dumps(payload, sort_keys=True).encode()).decode()
    sig = hmac.new(secret.encode(), body.encode(), hashlib.sha256).hexdigest()
    return f"{body}.{sig}"


def verify_token(secret: str, token: str) -> dict | None:
    """Claims dict when the signature checks out, else None."""
    body, _, sig = token.partition(".")
    if not body or not sig:
        return None
    expect = hmac.new(secret.encode(), body.encode(), hashlib.sha256).hexdigest()
    if not hmac.compare_digest(expect, sig):
        return None
    try:
        return json.loads(base64.urlsafe_b64decode(body.encode()))
    except Exception:
        return None


def auth_level(secret: str | None, token: str | None) -> int:
    """Effective auth level of a request: no secret configured → everything
    allowed; missing/invalid token → level 0 (public only)."""
    if secret is None:
        return 1 << 30
    if not token:
        return 0
    claims = verify_token(secret, token)
    if claims is None:
        return 0
    return int(claims.get("auth_level", 0))
