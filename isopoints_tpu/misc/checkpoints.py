"""Checkpoint I/O for parameter/optimizer pytrees + scalars.

Parity: reference DSS/misc/checkpoints.py (`CheckpointIO`): a registry
of named state pytrees, `save`, non-strict `load` returning leftover
scalars (epoch_it/it/loss_val_best), timestamped best-model backups.

Two backends:
  * 'npz' (default): a single `.npz` per checkpoint — every pytree
    leaf stored under its keystr path (host arrays; reload is
    non-strict like the reference's parse_state_dict :99-121). Scalars
    ride along as 0-d arrays. Single-host only: leaves must be fully
    addressable.
  * 'orbax': sharding-aware directory checkpoints via
    orbax.checkpoint — each leaf is written shard-by-shard, so a
    multi-host `jax.sharding.Mesh` run checkpoints without gathering
    to one host (SURVEY §5 "orbax-style, sharding-aware"). Restore is
    routed through the same non-strict template fill.
"""

import datetime
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np

from isopoints_tpu.logger import get_logger


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in flat}


def _restore_like(template, saved: Dict[str, np.ndarray], prefix: str):
    """Fill a pytree template from saved entries; non-strict."""
    log = get_logger()
    leaves, treedef = jax.tree_util.tree_flatten(template)
    flat = jax.tree_util.tree_flatten_with_path(template)[0]
    out = []
    for (path, leaf) in flat:
        key = prefix + jax.tree_util.keystr(path)
        if key in saved:
            val = saved[key]
            if val.shape != np.asarray(leaf).shape:
                log.warning("shape mismatch for %s: ckpt %s vs model %s — kept model",
                            key, val.shape, np.asarray(leaf).shape)
                out.append(leaf)
            else:
                out.append(val.astype(np.asarray(leaf).dtype))
        else:
            log.warning("missing key in checkpoint: %s — kept init", key)
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


class CheckpointIO:
    """Named-module checkpoint registry (checkpoints.py:9-121)."""

    def __init__(self, checkpoint_dir: str = "./chkpts",
                 backend: str = "npz", **registry):
        assert backend in ("npz", "orbax"), backend
        self.checkpoint_dir = checkpoint_dir
        self.backend = backend
        self.registry: Dict[str, Any] = dict(registry)
        os.makedirs(checkpoint_dir, exist_ok=True)

    def register_modules(self, **kwargs) -> None:
        self.registry.update(kwargs)

    def save(self, filename: str, **scalars) -> str:
        if self.backend == "orbax":
            return self._save_orbax(filename, scalars)
        if not os.path.isabs(filename):
            filename = os.path.join(self.checkpoint_dir, filename)
        payload: Dict[str, np.ndarray] = {}
        for name, tree in self.registry.items():
            for k, v in _flatten(tree).items():
                payload[f"{name}:{k}"] = v
        for k, v in scalars.items():
            payload[f"scalar:{k}"] = np.asarray(v)
        np.savez(filename, **payload)
        # np.savez appends .npz if missing
        return filename if filename.endswith(".npz") else filename + ".npz"

    def load(self, filename: str) -> Dict[str, Any]:
        """Load into the registered templates. Returns (a) updated
        registry entries in-place and (b) the leftover scalar dict."""
        if self.backend == "orbax":
            return self._load_orbax(filename)
        if not os.path.isabs(filename):
            filename = os.path.join(self.checkpoint_dir, filename)
        if not filename.endswith(".npz"):
            filename = filename + ".npz"
        if not os.path.exists(filename):
            raise FileNotFoundError(filename)
        get_logger().info("loading checkpoint from %s", filename)
        with np.load(filename, allow_pickle=False) as data:
            saved = {k: data[k] for k in data.files}
        scalars = {}
        for k, v in saved.items():
            if k.startswith("scalar:"):
                scalars[k[len("scalar:"):]] = v.item() if v.ndim == 0 else v
        for name in self.registry:
            sub = {k[len(name) + 1:]: v for k, v in saved.items()
                   if k.startswith(name + ":")}
            self.registry[name] = _restore_like(self.registry[name], sub, "")
        return scalars

    # -- orbax backend (sharding-aware) --------------------------------
    def _ckpt_path(self, filename: str) -> str:
        stem = filename[:-len(".npz")] if filename.endswith(".npz") \
            else filename
        if not os.path.isabs(stem):
            stem = os.path.join(self.checkpoint_dir, stem)
        return os.path.abspath(stem + ".orbax")

    @staticmethod
    def _safe_key(keystr: str) -> str:
        """keystr path -> orbax-friendly flat name ("['a'][0].b" ->
        "a.0.b"). Registry trees are saved as FLAT {name: leaf} dicts:
        restoring a raw pytree through orbax turns tuples/NamedTuples
        (optax optimizer states!) into dicts whose keystrs no longer
        match the template — the flat form keeps keys stable for the
        non-strict template fill."""
        out = keystr
        for a, b in (("['", "."), ("']", ""), ("[", "."), ("]", ""),
                     (".", ".")):
            out = out.replace(a, b)
        return out.lstrip(".") or "leaf"

    def _flatten_safe(self, tree) -> Dict[str, Any]:
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        out = {self._safe_key(jax.tree_util.keystr(p)): leaf
               for p, leaf in flat}
        assert len(out) == len(flat), \
            "checkpoint key collision after sanitization"
        return out

    def _save_orbax(self, filename: str, scalars: Dict[str, Any]) -> str:
        import orbax.checkpoint as ocp

        path = self._ckpt_path(filename)
        payload = {name: self._flatten_safe(tree)
                   for name, tree in self.registry.items()}
        payload["__scalars__"] = {k: np.asarray(v) for k, v in
                                  scalars.items()}
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, payload, force=True)
        return path

    def _load_orbax(self, filename: str) -> Dict[str, Any]:
        import orbax.checkpoint as ocp

        path = self._ckpt_path(filename)
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        get_logger().info("loading checkpoint from %s", path)
        with ocp.PyTreeCheckpointer() as ckptr:
            saved = ckptr.restore(path)
        scalars = {k: (v.item() if np.ndim(v) == 0 else v)
                   for k, v in saved.pop("__scalars__", {}).items()}
        for name in self.registry:
            if name not in saved:
                get_logger().warning(
                    "checkpoint has no entry for %s — kept init", name)
                continue
            # map the flat saved names back onto the template's keystr
            # namespace, then reuse the non-strict template fill
            flat_saved = saved[name]
            tmpl_paths = jax.tree_util.tree_flatten_with_path(
                self.registry[name])[0]
            sub = {}
            for p, _ in tmpl_paths:
                ks = jax.tree_util.keystr(p)
                sk = self._safe_key(ks)
                if sk in flat_saved:
                    sub[ks] = np.asarray(flat_saved[sk])
            self.registry[name] = _restore_like(self.registry[name], sub, "")
        return scalars

    def backup_model_best(self, filename: str = "model_best.npz") -> Optional[str]:
        """Timestamped copy of the best model (checkpoints.py:43-53)."""
        src = os.path.join(self.checkpoint_dir, filename)
        if not os.path.exists(src):
            return None
        ts = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M")
        dst = os.path.join(self.checkpoint_dir, f"model_{ts}.npz")
        shutil.copy(src, dst)
        return dst
