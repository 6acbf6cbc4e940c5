"""Epoch-numbered pytree checkpoints (orbax).

Reference: ``torch.save(model.state_dict(), model_checkpoint_{epoch}.pth)``
every epoch (``src/train_model.py:92-93``) + filtered restore
(``src/train_utils.py:11-36``).  Here full train state (params + optimizer)
is saved so resume is exact, and ``restore_params`` offers the reference's
partial/filtered restore behavior for architecture-compatible checkpoints.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _checkpointer() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def checkpoint_path(directory: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(directory), f"checkpoint_{epoch}")


def save_checkpoint(directory: str, epoch: int, tree: Any) -> str:
    path = checkpoint_path(directory, epoch)
    ckptr = _checkpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(directory: str, epoch: int, target: Any) -> Any:
    path = checkpoint_path(directory, epoch)
    return _checkpointer().restore(path, target)


def latest_epoch(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    epochs = [
        int(name.rsplit("_", 1)[1])
        for name in os.listdir(directory)
        if name.startswith("checkpoint_") and name.rsplit("_", 1)[1].isdigit()
    ]
    return max(epochs) if epochs else None


def restore_params(directory: str, epoch: int, params_template: Any) -> Any:
    """Filtered param restore: keys absent from the template are dropped,
    keys absent from the checkpoint keep their template values (the
    reference's ``load_model_state`` key-filtering, ``train_utils.py:28-35``)."""
    restored = restore_checkpoint(directory, epoch, {"params": params_template})
    flat_t = jax.tree_util.tree_flatten_with_path(params_template)[0]
    flat_r = dict(jax.tree_util.tree_flatten_with_path(restored["params"])[0])
    merged = {
        jax.tree_util.keystr(path): flat_r.get(path, leaf)
        for path, leaf in flat_t
    }
    leaves = [merged[jax.tree_util.keystr(p)] for p, _ in flat_t]
    treedef = jax.tree_util.tree_structure(params_template)
    return jax.tree_util.tree_unflatten(treedef, leaves)
