"""Config plumbing: JSON configs + CLI merge, matching the reference's
"config file first, CLI fallback" rule (ddpm_torch/utils/__init__.py:47-59,
96-101)."""

from __future__ import annotations

import json
import os
from typing import Any, Mapping

__all__ = [
    "ConfigDict",
    "get_param",
    "dict2str",
    "load_config",
    "resolve_config",
    "bundled_configs",
    "CONFIG_DIR",
    "CONFIGLESS_DATASETS",
]

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")

# Datasets the reference ships no config for either (reference configs/ holds
# only cifar10/celeba/celebahq); these may run from CLI flags alone.
CONFIGLESS_DATASETS = frozenset({"mnist", "fakedata", "blobs"})


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


def bundled_configs() -> list[str]:
    """Names of the configs shipped inside the package."""
    if not os.path.isdir(CONFIG_DIR):
        return []
    return sorted(
        f[: -len(".json")] for f in os.listdir(CONFIG_DIR) if f.endswith(".json")
    )


def load_config(path_or_name: str, search_dir: str | None = None) -> ConfigDict:
    """Load a JSON config by absolute path or by name (e.g. 'cifar10')
    looked up in ``search_dir`` (default: the bundled configs).

    Names also resolve with underscores stripped so the registry key
    'celeba_hq' finds the reference-named file 'celebahq.json'
    (reference: configs/celebahq.json vs datasets.py:17-19 name rule).
    """
    path = path_or_name
    if not os.path.isfile(path):
        for name in (path_or_name, path_or_name.replace("_", "")):
            cand = os.path.join(search_dir or CONFIG_DIR, f"{name}.json")
            if os.path.isfile(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(path_or_name)
    with open(path) as f:
        raw = json.load(f)

    def wrap(x):
        if isinstance(x, dict):
            return ConfigDict({k: wrap(v) for k, v in x.items()})
        return x

    return wrap(raw)


def resolve_config(
    dataset: str,
    config_path: str | None = None,
    config_dir: str | None = None,
    logger=print,
) -> ConfigDict | None:
    """Resolve the run config for a CLI invocation, failing loudly on a miss.

    The reference opens ``configs/<dataset>.json`` unconditionally
    (train.py:24) so a missing config is a hard error there too. Datasets in
    CONFIGLESS_DATASETS are allowed to run from CLI flags alone (with a
    warning) since the reference ships no config for them either.
    """
    path = config_path or dataset
    try:
        # a user --config-dir gets the same name/alias lookup as the
        # bundled configs (one rule, defined in load_config)
        return load_config(path, search_dir=config_dir)
    except FileNotFoundError:
        if config_path or config_dir or dataset not in CONFIGLESS_DATASETS:
            raise SystemExit(
                f"error: no config found for {path!r} "
                f"(bundled: {bundled_configs()}); pass --config-path, or use a "
                f"configless dataset ({sorted(CONFIGLESS_DATASETS)}) to run "
                "from CLI flags alone"
            ) from None
        logger(
            f"warning: no bundled config for dataset {dataset!r}; "
            "model/diffusion/train settings come from CLI flags"
        )
        return None
