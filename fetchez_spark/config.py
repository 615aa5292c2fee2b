"""Engine-level user config: ``~/.fetchez_spark/config.{yaml,yml,json}``.

The reference loads user defaults from a dot-dir config file
(/root/reference/src/fetchez/config.py:25-42); here the same idea feeds
the engine's extension points:

* ``plugin_dir`` / ``preset_dir`` -- where :func:`registry.load_plugins`
  and :func:`transforms.load_preset_files` look by default;
* ``sink`` -- default kwargs for registry-constructed sinks (e.g.
  ``num_buckets``, ``compact_every``); explicit recipe/CLI args win;
* ``session`` -- extra SparkSession conf pairs merged under explicit
  ``extra_conf``.

Resolution order: ``$FETCHEZ_SPARK_CONFIG`` (explicit path) else the
first of config.yaml / config.yml / config.json in ``~/.fetchez_spark``.
A missing file is not an error -- defaults apply.
"""

from __future__ import annotations

import json
import os
from typing import Any

DEFAULTS: dict[str, Any] = {
    "plugin_dir": "~/.fetchez_spark/plugins",
    "preset_dir": "~/.fetchez_spark/presets",
    "sink": {},
    "session": {},
}

_cache: dict[str, Any] | None = None


def config_path() -> str | None:
    env = os.environ.get("FETCHEZ_SPARK_CONFIG")
    if env:
        return env
    base = os.path.expanduser("~/.fetchez_spark")
    for fn in ("config.yaml", "config.yml", "config.json"):
        p = os.path.join(base, fn)
        if os.path.isfile(p):
            return p
    return None


def load_config(path: str | None = None, use_cache: bool = True) -> dict[str, Any]:
    """User config merged over :data:`DEFAULTS` (one level deep for the
    ``sink``/``session`` sub-dicts).  Cached per process; pass
    ``use_cache=False`` after editing the file mid-session."""
    global _cache
    if path is None and use_cache and _cache is not None:
        return _cache
    cfg = {k: (dict(v) if isinstance(v, dict) else v) for k, v in DEFAULTS.items()}
    p = path or config_path()
    if p and os.path.isfile(p):
        with open(p) as f:
            if p.endswith(".json"):
                user = json.load(f) or {}
            else:
                import yaml

                user = yaml.safe_load(f) or {}
        for k, v in user.items():
            if isinstance(v, dict) and isinstance(cfg.get(k), dict):
                cfg[k].update(v)
            else:
                cfg[k] = v
    if path is None:
        _cache = cfg
    return cfg


def plugin_dir() -> str:
    return os.path.expanduser(load_config()["plugin_dir"])


def preset_dir() -> str:
    return os.path.expanduser(load_config()["preset_dir"])


def sink_defaults() -> dict[str, Any]:
    return dict(load_config()["sink"])


def session_conf() -> dict[str, str]:
    return {str(k): str(v) for k, v in load_config()["session"].items()}
