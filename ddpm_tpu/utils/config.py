"""Config plumbing: JSON configs + CLI merge, matching the reference's
"config file first, CLI fallback" rule (ddpm_torch/utils/__init__.py:47-59,
96-101)."""

from __future__ import annotations

import json
import os
from typing import Any, Mapping

__all__ = ["ConfigDict", "get_param", "dict2str", "load_config", "CONFIG_DIR"]

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")


class ConfigDict(dict):
    """Attribute-access dict that returns None for missing keys."""

    def __getattr__(self, name: str) -> Any:
        if name.startswith("__"):
            raise AttributeError(name)
        return self.get(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value


def get_param(name: str, config: Mapping[str, Any] | None, args=None, default=None):
    """Two-source lookup: config section wins, then CLI args, then default."""
    if config is not None and config.get(name) is not None:
        return config[name]
    if args is not None:
        val = getattr(args, name, None)
        if val is not None:
            return val
    return default


def dict2str(d: Mapping[str, Any]) -> str:
    """Compact stringifier used for experiment info records."""
    out = []
    for k, v in d.items():
        if isinstance(v, Mapping):
            out.append(f"{k}:({dict2str(v)})")
        else:
            out.append(f"{k}:{v}")
    return ",".join(out)


def load_config(path_or_name: str) -> ConfigDict:
    """Load a JSON config by absolute path or bundled name (e.g. 'cifar10')."""
    path = path_or_name
    if not os.path.isfile(path):
        cand = os.path.join(CONFIG_DIR, f"{path_or_name}.json")
        if os.path.isfile(cand):
            path = cand
        else:
            raise FileNotFoundError(path_or_name)
    with open(path) as f:
        raw = json.load(f)

    def wrap(x):
        if isinstance(x, dict):
            return ConfigDict({k: wrap(v) for k, v in x.items()})
        return x

    return wrap(raw)
