"""Env-file config bootstrap (reference C4, ``main.go:252-255``).

The reference loads ``.env`` via godotenv; same contract here with
stdlib only. Existing process env always wins (godotenv semantics).
Unlike the reference (``neo4j.go:30-32``), values are never logged.
"""

from __future__ import annotations

import os


def load_env_file(path: str = ".env", override: bool = False) -> dict[str, str]:
    """Parse KEY=VALUE lines (``#`` comments, optional ``export``,
    single/double quotes) into os.environ. Returns what was loaded."""
    loaded: dict[str, str] = {}
    if not os.path.exists(path):
        return loaded
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            if line.startswith("export "):
                line = line[len("export "):]
            key, _, value = line.partition("=")
            key = key.strip()
            value = value.strip().strip("'\"")
            if not key:
                continue
            if override or key not in os.environ:
                os.environ[key] = value
            loaded[key] = value
    return loaded
