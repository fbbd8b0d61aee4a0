"""Config-file support for CLI defaults.

The reference's workflow layer was configured through a HOCON site file
(``swift/swift.conf`` — maxParallelTasks, executionRetries, lazyErrors,
workdir...).  The analog here is a small JSON config, loadable via
``--config`` or auto-discovered as ``cfrk.json`` in the working
directory, whose keys are CLI flag names (dashes or underscores) and
which argv always overrides.

Example ``cfrk.json``::

    {
      "k": 8,
      "mode": "perread",
      "batch-size": 16384,
      "max-parallel-tasks": 2,
      "retries": 1,
      "provenance": "prov.jsonl"
    }
"""

from __future__ import annotations

import json
import os

__all__ = ["load_config", "apply_config", "DEFAULT_CONFIG_NAME"]

DEFAULT_CONFIG_NAME = "cfrk.json"


def load_config(path: str | None) -> dict:
    """Load a config dict; auto-discovers ``cfrk.json`` if path is None."""
    if path is None:
        if os.path.exists(DEFAULT_CONFIG_NAME):
            path = DEFAULT_CONFIG_NAME
        else:
            return {}
    with open(path) as f:
        cfg = json.load(f)
    if not isinstance(cfg, dict):
        raise ValueError(f"config {path} must be a JSON object")
    return {k.replace("-", "_"): v for k, v in cfg.items()}


def apply_config(args, cfg: dict, parser) -> None:
    """Fill parser-default values from the config (argv wins).

    Only keys matching known argparse destinations are applied; unknown
    keys raise, so typos fail loudly.
    """
    valid = {a.dest for a in parser._actions}
    defaults = {a.dest: a.default for a in parser._actions}
    for key, val in cfg.items():
        if key not in valid:
            raise SystemExit(f"unknown config key: {key!r}")
        # argv wins: only apply when the arg still holds its default.
        if getattr(args, key, None) == defaults.get(key):
            setattr(args, key, val)
