"""Checkpoint / resume (SURVEY.md §5): whole-pipeline state as pytrees.

The reference persists only detector weights; tracker state is ephemeral.
Here both are pytrees, so mid-video resume is first-class:

  * save/load any pytree (TrackBank, detector params, optimizer state)
    via orbax when available, npz otherwise — same call sites.
  * `save_pipeline` bundles tracker bank + detector params + config.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def _has_orbax() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401
        return True
    except Exception:
        return False


def save_pytree(path: str, tree) -> None:
    """Persist a pytree. Directory path → orbax; .npz path → flat npz."""
    tree = jax.tree.map(np.asarray, tree)
    if path.endswith(".npz"):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **{jax.tree_util.keystr(k): v for k, v in flat})
        return
    if _has_orbax():
        import orbax.checkpoint as ocp
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(os.path.abspath(path), tree, force=True)
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(os.path.join(path, "state.pkl") if os.path.isdir(path)
              else path, "wb") as f:
        pickle.dump(tree, f)


def load_pytree(path: str, like):
    """Restore a pytree with the structure of `like`."""
    if path.endswith(".npz"):
        data = np.load(path)
        leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
        new = [jnp.asarray(data[jax.tree_util.keystr(k)])
               for k, _ in leaves]
        return jax.tree_util.tree_unflatten(treedef, new)
    pkl = os.path.join(path, "state.pkl")
    if os.path.isdir(path) and os.path.exists(pkl):
        # Pickle fallback written into a directory (save side without
        # orbax) — must win over the orbax branch so a checkpoint saved
        # on a host without orbax restores on one with it, and vice
        # versa the directory is not misread as a raw pickle file.
        with open(pkl, "rb") as f:
            return jax.tree.map(jnp.asarray, pickle.load(f))
    if _has_orbax() and os.path.isdir(path):
        import orbax.checkpoint as ocp
        ckpt = ocp.PyTreeCheckpointer()
        restored = ckpt.restore(os.path.abspath(path),
                                item=jax.tree.map(np.asarray, like))
        return jax.tree.map(jnp.asarray, restored)
    if os.path.isdir(path):
        raise FileNotFoundError(
            f"{path} is a directory without state.pkl and orbax is "
            "unavailable — cannot restore")
    with open(path, "rb") as f:
        return jax.tree.map(jnp.asarray, pickle.load(f))


def save_pipeline(path: str, bank, detector_params=None, cfg=None) -> None:
    """One-call snapshot of the full serving state (mid-video resume)."""
    tree = {"bank": bank}
    if detector_params is not None:
        tree["detector"] = detector_params
    save_pytree(os.path.join(path, "state") if not path.endswith(".npz")
                else path, tree)
    if cfg is not None:
        os.makedirs(path if not path.endswith(".npz")
                    else os.path.dirname(path) or ".", exist_ok=True)
        cfg_path = (os.path.join(path, "config.pkl")
                    if not path.endswith(".npz")
                    else path.replace(".npz", "_config.pkl"))
        with open(cfg_path, "wb") as f:
            pickle.dump(cfg, f)
