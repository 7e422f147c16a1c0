"""Python-file config system with `_base_` inheritance.

Spec: the reference uses mmcv Config.fromfile (read_config,
diffusion/utils/misc.py:21-30) over python config files with `_base_` lists
(configs/PixArt_xl2_internal.py + children). This is a self-contained
re-implementation: exec the file, recursively merge over its bases
(dicts deep-merged, everything else overridden), expose attr access, and
dump for provenance (reference train.py:338-339).
"""

from __future__ import annotations

import copy
import os
import pprint
from typing import Any, Dict


class Config(dict):
    """dict with attribute access (nested dicts stay plain dicts)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def get(self, key, default=None):
        return super().get(key, default)

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(pprint.pformat(dict(self), width=100, sort_dicts=True))

    def update_from_args(self, args, keys) -> None:
        """argparse overrides (reference train.py:282-296 pattern)."""
        for key in keys:
            val = getattr(args, key, None)
            if val is not None:
                self[key] = val


def _exec_config(path: str) -> Dict[str, Any]:
    namespace: Dict[str, Any] = {"__file__": os.path.abspath(path)}
    with open(path) as f:
        code = f.read()
    exec(compile(code, path, "exec"), namespace)
    return {
        k: v
        for k, v in namespace.items()
        if not k.startswith("__") and not callable(v) or k == "tau_fn"
    }


def _deep_merge(base: Dict[str, Any], child: Dict[str, Any]) -> Dict[str, Any]:
    out = copy.deepcopy(base)
    for k, v in child.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def read_config(path: str) -> Config:
    """Load a python config file, resolving `_base_` inheritance."""
    ns = _exec_config(path)
    bases = ns.pop("_base_", [])
    if isinstance(bases, str):
        bases = [bases]
    merged: Dict[str, Any] = {}
    for base in bases:
        base_path = os.path.join(os.path.dirname(os.path.abspath(path)), base)
        merged = _deep_merge(merged, read_config(base_path))
    merged = _deep_merge(merged, ns)
    return Config(merged)
