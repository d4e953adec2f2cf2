"""OAuth2 client-credentials token source (reference S2,
``main.go:84-119``).

The reference POSTs a ``client_credentials`` grant and injects the
returned bearer token into its HTTP source. Same shape here, driver
side (tokens are per-job secrets, never per-row data), with the
transport injectable so tests run without network. Credentials come
from the environment — and are never logged (the reference prints them,
``neo4j.go:30-32``; we deliberately do not reproduce that).
"""

from __future__ import annotations

import json
import os
import urllib.parse
import urllib.request
from collections.abc import Callable


def fetch_client_credentials_token(
    token_url: str,
    client_id: str | None = None,
    client_secret: str | None = None,
    audience: str | None = None,
    transport: Callable[[str, bytes, dict[str, str]], str] | None = None,
    env_prefix: str = "OAUTH",
) -> str:
    """Return an access token via the OAuth2 client-credentials flow.

    ``client_id``/``client_secret`` default to ``$<PREFIX>_CLIENT_ID`` /
    ``$<PREFIX>_CLIENT_SECRET`` (reference: ``HCP_CLIENT_ID``/
    ``HCP_CLIENT_SECRET``, ``main.go:86-87``).
    """
    client_id = client_id or os.environ.get(f"{env_prefix}_CLIENT_ID")
    client_secret = client_secret or os.environ.get(f"{env_prefix}_CLIENT_SECRET")
    if not client_id or not client_secret:
        raise ValueError("missing OAuth client credentials")

    form = {
        "grant_type": "client_credentials",
        "client_id": client_id,
        "client_secret": client_secret,
    }
    if audience:
        form["audience"] = audience
    body = urllib.parse.urlencode(form).encode()
    headers = {"Content-Type": "application/x-www-form-urlencoded"}

    if transport is None:
        transport = _default_transport
    resp = transport(token_url, body, headers)
    payload = json.loads(resp)
    token = payload.get("access_token")
    if not token:
        raise ValueError("token endpoint returned no access_token")
    return token


def _default_transport(url: str, body: bytes, headers: dict[str, str]) -> str:
    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
        return resp.read().decode("utf-8")
