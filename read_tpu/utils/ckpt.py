"""Checkpointing: net params + per-scene textures + optimizer states +
step + config, config-embedded for self-configuring inference.

Parity targets:
- reference saves ``{'state_dict', 'args'}`` per state object
  (``READ/utils/train.py:42-57``; ``READ/pipelines/pipeline.py:59-71``)
  and reconstructs the full pipeline from the embedded args in the viewer
  (``pipeline.py:34-56``) — the config-in-checkpoint property is kept.
- src keeps rotating latest-3 + best-on-val-improvement
  (``src/train.py:619-653``, ``src/READ/pipelines/pipeline.py:59-74``).
- UNLIKE the reference (which re-inits optimizers on load), checkpoints
  here carry optimizer state and step — true resume.

Format: a directory per save containing ``state.npz`` (flat pytree
leaves) + ``meta.json`` (treedef paths, config, step). Plain npz keeps
zero extra deps and loads anywhere; orbax remains an option for
multi-host async saves later.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint",
           "rotate_checkpoints"]


def _path_str(p) -> str:
    # DictKey -> .key, GetAttrKey -> .name, SequenceKey -> .idx
    for attr in ("key", "name", "idx"):
        if hasattr(p, attr):
            return str(getattr(p, attr))
    return str(p)


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(template, flat: Dict[str, np.ndarray]):
    paths = jax.tree_util.tree_flatten_with_path(template)[0]
    treedef = jax.tree_util.tree_structure(template)
    leaves = []
    for path, leaf in paths:
        key = "/".join(_path_str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch for {key}: ckpt {arr.shape} vs "
                f"template {leaf.shape}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path: str, state: Any, config: Optional[dict] = None,
                    extra: Optional[dict] = None) -> str:
    """Write ``state`` (any pytree) + config to directory ``path``."""
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    flat = _flatten(state)
    np.savez(os.path.join(tmp, "state.npz"), **flat)
    meta = {"config": config or {}, "extra": extra or {},
            "keys": sorted(flat)}
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1, default=str)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    return path


def load_checkpoint(path: str, template: Any = None
                    ) -> Tuple[Any, dict]:
    """Load a checkpoint dir. With a ``template`` pytree, returns the
    restored pytree (+meta); without, returns the flat dict."""
    with np.load(os.path.join(path, "state.npz")) as z:
        flat = {k: z[k] for k in z.files}
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if template is None:
        return flat, meta
    return _unflatten(template, flat), meta


def latest_checkpoint(directory: str, prefix: str = "ckpt"
                      ) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    cands = [d for d in os.listdir(directory)
             if d.startswith(prefix) and not d.endswith(".tmp")]
    if not cands:
        return None

    def step_of(name):
        try:
            return int(name.rsplit("_", 1)[-1])
        except ValueError:
            return -1

    return os.path.join(directory, max(cands, key=step_of))


def rotate_checkpoints(directory: str, prefix: str = "ckpt",
                       keep: int = 3) -> None:
    """Keep the ``keep`` newest ``prefix_*`` dirs (src parity: rotating
    latest-3, ``src/train.py:640-653``). ``best`` is never rotated."""
    if not os.path.isdir(directory):
        return
    cands = [d for d in os.listdir(directory)
             if d.startswith(prefix + "_") and not d.endswith(".tmp")]

    def step_of(name):
        try:
            return int(name.rsplit("_", 1)[-1])
        except ValueError:
            return -1

    for d in sorted(cands, key=step_of)[:-keep]:
        shutil.rmtree(os.path.join(directory, d))
