"""Checkpoint/restore for params, optimizer state, and serving state.

SURVEY.md section 5 scopes checkpointing to "KV cache is the only state;
metadata snapshot, orbax optional".  Round 1 shipped the serving-state
snapshot (:meth:`runtime.engine.Engine.state_dict`, recompute-style); this
module adds the optional durable layer: orbax for the array pytrees
(params / optax state — sharded arrays restore onto their saved shardings)
plus a JSON sidecar for the engine's token-level state, so a whole serving
or training process can round-trip through disk.
"""

from __future__ import annotations

import json
import os

import jax

__all__ = ["save_checkpoint", "load_checkpoint"]

_ENGINE_FILE = "engine_state.json"
_TREE_DIR = "tree"


def save_checkpoint(path: str, tree, *, engine_state: dict | None = None) -> None:
    """Write ``tree`` (any pytree of arrays: params, {params, opt_state}, ...)
    under ``path`` via orbax, plus an optional engine ``state_dict`` sidecar.

    Overwrites an existing checkpoint at the same path atomically (orbax
    semantics).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, _TREE_DIR), tree, force=True)
    if engine_state is not None:
        with open(os.path.join(path, _ENGINE_FILE), "w") as f:
            json.dump(engine_state, f)


def load_checkpoint(path: str, *, target=None):
    """Restore (tree, engine_state|None) written by :func:`save_checkpoint`.

    ``target``: optional pytree of like-structured arrays (e.g. abstract
    shapes or freshly-inited params) guiding dtypes/shardings; without it,
    arrays restore as saved.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            tree = ckptr.restore(
                os.path.join(path, _TREE_DIR),
                args=ocp.args.PyTreeRestore(
                    restore_args=jax.tree.map(
                        lambda x: ocp.ArrayRestoreArgs(
                            sharding=getattr(x, "sharding", None)
                        ),
                        target,
                    )
                ),
            )
        else:
            tree = ckptr.restore(os.path.join(path, _TREE_DIR))
    engine_state = None
    sidecar = os.path.join(path, _ENGINE_FILE)
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            engine_state = json.load(f)
    return tree, engine_state
