"""Client config + auth stand-in (SURVEY.md §2.6 C13).

Reference: ``~/.sutro/config.json`` holding {api_key, base_url}
(/root/reference/sutro/validation.py:36-60, cli.py:17-46). The local
engine needs no credentials for the stub backend; the config file keeps
the same shape for the HTTP backend.
"""

from __future__ import annotations

import json
import os

CONFIG_PATH = os.path.expanduser("~/.sutro_spark/config.json")


def load_config() -> dict:
    path = os.environ.get("SUTRO_SPARK_CONFIG", CONFIG_PATH)
    if not os.path.isfile(path):
        return {}
    with open(path) as f:
        return json.load(f)


def save_config(api_key: str = "", base_url: str = "") -> str:
    path = os.environ.get("SUTRO_SPARK_CONFIG", CONFIG_PATH)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump({"api_key": api_key, "base_url": base_url}, f)
    return path


def try_authentication() -> bool:
    """Reference pings the API with the stored key (sdk.py:1598-1625);
    the stub backend always authenticates."""
    cfg = load_config()
    if cfg.get("base_url"):
        return False  # no network in this environment
    return True
