"""Configuration loading: YAML base → environment overrides → merge →
validation.

Reference parity: /root/reference/src/utils/config_loader.py:22-117 — same
precedence (env beats file), same env variable names (``MDP_SYMBOLS``,
``MDP_START_DATE``, ``MDP_END_DATE``, ``MDP_RETRY``, ``MDP_DATA_PATHS_RAW``,
``MDP_DATA_PATHS_PROCESSED``, ``MDP_LOGGING_LEVEL``, ``MDP_LOGGING_DIR``),
same required-field contract and the symbols ← market_scope.symbols fallback.
Pure driver-side dict plumbing — no Spark involvement.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import yaml


class ConfigValidationError(ValueError):
    pass


REQUIRED_FIELDS = ("start_date", "end_date", "data_paths", "logging", "retry")


def load_config(path: str | Path, env: dict | None = None) -> dict[str, Any]:
    """Read YAML, apply env overrides, merge, validate. Returns the merged
    dict (config_loader.py:22-30 semantics)."""
    base = _read_yaml(path)
    overrides = _env_overrides(env if env is not None else os.environ)
    merged = _merge(base, overrides)
    _validate(merged)
    return merged


def _read_yaml(path: str | Path) -> dict[str, Any]:
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"config file not found: {p}")
    with p.open("r", encoding="utf-8") as fh:
        return yaml.safe_load(fh) or {}


def _env_overrides(env: dict) -> dict[str, Any]:
    overrides: dict[str, Any] = {}
    if symbols := env.get("MDP_SYMBOLS"):
        parsed = [s.strip() for s in symbols.split(",") if s.strip()]
        if parsed:
            overrides["symbols"] = parsed
    if start := env.get("MDP_START_DATE"):
        overrides["start_date"] = start
    if end := env.get("MDP_END_DATE"):
        overrides["end_date"] = end
    if retry := env.get("MDP_RETRY"):
        try:
            overrides["retry"] = int(retry)
        except ValueError:
            raise ConfigValidationError("MDP_RETRY must be an integer")
    data_paths = {
        k: v
        for k, v in (
            ("raw", env.get("MDP_DATA_PATHS_RAW")),
            ("processed", env.get("MDP_DATA_PATHS_PROCESSED")),
        )
        if v
    }
    if data_paths:
        overrides.setdefault("data_paths", {}).update(data_paths)
    logging_cfg = {
        k: v
        for k, v in (
            ("level", env.get("MDP_LOGGING_LEVEL")),
            ("dir", env.get("MDP_LOGGING_DIR")),
        )
        if v
    }
    if logging_cfg:
        overrides.setdefault("logging", {}).update(logging_cfg)
    return overrides


def _merge(base: dict, override: dict) -> dict[str, Any]:
    out: dict[str, Any] = {
        k: (v.copy() if isinstance(v, dict) else v) for k, v in base.items()
    }
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k].update(v)
        else:
            out[k] = v
    return out


def _validate(config: dict[str, Any]) -> None:
    for field in REQUIRED_FIELDS:
        if field not in config or config[field] in (None, "", []):
            raise ConfigValidationError(f"required config field missing: {field!r}")
    if not config.get("symbols"):
        scope = config.get("market_scope") or {}
        if isinstance(scope, dict) and scope.get("symbols"):
            config["symbols"] = scope["symbols"]
        else:
            raise ConfigValidationError(
                "symbols required: set symbols or market_scope.symbols"
            )
    if not isinstance(config["symbols"], list):
        raise ConfigValidationError("symbols must be a list of strings")
    if not isinstance(config["data_paths"], dict):
        raise ConfigValidationError("data_paths must be a dict with raw and processed")
    if "raw" not in config["data_paths"] or "processed" not in config["data_paths"]:
        raise ConfigValidationError('data_paths must contain "raw" and "processed"')
    if "level" not in config["logging"]:
        raise ConfigValidationError("logging.level is required")
    if not isinstance(config["retry"], int):
        try:
            config["retry"] = int(config["retry"])
        except (TypeError, ValueError):
            raise ConfigValidationError("retry must be an integer")
