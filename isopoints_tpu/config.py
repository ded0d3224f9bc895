"""YAML config system with recursive inheritance.

Parity: reference config.py:18-133 (`load_config` with `inherit_from`
chains + default file, `update_recursive`, `save_config`) — easydict
replaced with a small AttrDict. Factories (`create_model` etc.) live in
`isopoints_tpu.factories` so this module stays dependency-light.
"""

import os
from typing import Any, Dict, Optional

import yaml


class AttrDict(dict):
    """dict with attribute access, recursively."""

    def __init__(self, d: Optional[Dict] = None):
        super().__init__()
        for k, v in (d or {}).items():
            self[k] = _wrap(v)

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = _wrap(v)

    def to_dict(self) -> Dict[str, Any]:
        return {k: _unwrap(v) for k, v in self.items()}


def _unwrap(v):
    """Invert _wrap recursively (incl. AttrDicts nested in lists, which
    yaml.safe_dump refuses to represent)."""
    if isinstance(v, AttrDict):
        return v.to_dict()
    if isinstance(v, (list, tuple)):
        return type(v)(_unwrap(x) for x in v)
    return v


def _wrap(v):
    if isinstance(v, dict) and not isinstance(v, AttrDict):
        return AttrDict(v)
    if isinstance(v, (list, tuple)):
        return type(v)(_wrap(x) for x in v)
    return v


def update_recursive(dst: Dict, src: Dict) -> None:
    """Deep-merge src into dst (reference config.py:67-82)."""
    for k, v in src.items():
        if k not in dst:
            dst[k] = AttrDict() if isinstance(v, dict) else None
        if isinstance(v, dict):
            if not isinstance(dst[k], dict):
                dst[k] = AttrDict()
            update_recursive(dst[k], v)
        else:
            dst[k] = v


def load_config(path: str, default_path: Optional[str] = None) -> AttrDict:
    """Load YAML config, following `inherit_from` chains recursively."""
    with open(path, "r") as f:
        cfg_special = yaml.safe_load(f) or {}

    inherit_from = cfg_special.get("inherit_from")
    if inherit_from is not None:
        base = inherit_from
        if not os.path.isabs(base):
            base = os.path.join(os.path.dirname(path), base)
            if not os.path.exists(base):
                base = inherit_from  # cwd-relative fallback
        if os.path.exists(base):
            cfg = load_config(base, default_path)
        elif os.path.basename(os.path.dirname(os.path.abspath(path))) \
                == "configs":
            # a hand-written config with a typo'd base must fail loudly
            # — silently training with default hyper-parameters is far
            # worse than a FileNotFoundError (r4 advisor)
            raise FileNotFoundError(
                f"inherit_from base {inherit_from!r} not found relative "
                f"to {path!r}")
        else:
            # Saved out-dir configs are already fully resolved but (before
            # save_config stripped it) kept a stale `inherit_from` that does
            # not resolve from the out dir. Fall back to defaults only.
            import warnings
            warnings.warn(
                f"inherit_from base {inherit_from!r} not found relative to "
                f"{path!r}; treating config as fully resolved")
            cfg = (load_config(default_path)
                   if default_path is not None
                   and os.path.abspath(default_path) != os.path.abspath(path)
                   else AttrDict())
    elif default_path is not None and os.path.abspath(default_path) != os.path.abspath(path):
        cfg = load_config(default_path)
    else:
        cfg = AttrDict()

    update_recursive(cfg, cfg_special)
    return AttrDict(cfg)


def save_config(path: str, cfg: Dict) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = cfg.to_dict() if isinstance(cfg, AttrDict) else dict(cfg)
    # The saved config is fully resolved; a stale inherit_from would break
    # reloading it from the out dir (the base is configs/-relative).
    data.pop("inherit_from", None)
    with open(path, "w") as f:
        yaml.safe_dump(data, f, default_flow_style=False, sort_keys=False)


_DEFAULT_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "default.yaml")


def default_config_path() -> str:
    return os.path.abspath(_DEFAULT_PATH)
