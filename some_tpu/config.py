"""YAML config cascade.

Configs declare a ``base_config`` list of parent YAML files; parents are
squashed depth-first and the child overrides leaf keys (nested dicts merge
recursively). Mirrors the semantics of the reference config system
(reference: utils/config_utils.py:11-41) so existing SOME config files work
unchanged, including the class-path selection keys (``task_cls`` etc.).
"""
from __future__ import annotations

import pathlib
from typing import Any, Dict

import yaml

_CONFIG_CACHE: Dict[str, dict] = {}


def deep_update(base: dict, overrides: dict) -> dict:
    """Recursively merge ``overrides`` into ``base`` (in place, returns base)."""
    for key, value in overrides.items():
        if isinstance(value, dict) and isinstance(base.get(key), dict):
            deep_update(base[key], value)
        else:
            base[key] = value
    return base


def read_full_config(config_path: pathlib.Path | str) -> dict:
    """Load a YAML config, resolving its ``base_config`` inheritance chain.

    Relative parent paths resolve against the current working directory first
    (reference behavior), then against the config file's own directory as a
    fallback so configs are usable from any cwd.
    """
    config_path = pathlib.Path(config_path).resolve()
    cache_key = config_path.as_posix()
    if cache_key in _CONFIG_CACHE:
        return _CONFIG_CACHE[cache_key]

    with open(config_path, "r", encoding="utf8") as f:
        config = yaml.safe_load(f) or {}
    if "base_config" not in config:
        _CONFIG_CACHE[cache_key] = config
        return config

    bases = config["base_config"]
    if not isinstance(bases, list):
        bases = [bases]
    squashed: dict = {}
    for base in bases:
        base_path = pathlib.Path(base)
        if not base_path.exists():
            candidate = config_path.parent / base_path.name
            if candidate.exists():
                base_path = candidate
            else:
                candidate = config_path.parent / base_path
                if candidate.exists():
                    base_path = candidate
        deep_update(squashed, read_full_config(base_path))
    deep_update(squashed, config)
    squashed.pop("base_config")
    _CONFIG_CACHE[cache_key] = squashed
    return squashed


def print_config(config: dict) -> None:
    """Colorized k: v dump, five entries per line."""
    items = sorted(config.items())
    for i, (k, v) in enumerate(items):
        print(f"\033[0;33m{k}\033[0m: {v}", end="")
        if i < len(items) - 1:
            print(", ", end="")
        if i % 5 == 4:
            print()
    print()


def dump_config(config: dict, path: pathlib.Path | str) -> None:
    with open(path, "w", encoding="utf8") as f:
        yaml.safe_dump(config, f)


def config_get(config: dict, key: str, default: Any = None) -> Any:
    """Dotted-path getter: ``config_get(cfg, 'optimizer_args.lr')``."""
    node: Any = config
    for part in key.split("."):
        if not isinstance(node, dict) or part not in node:
            return default
        node = node[part]
    return node
