"""Training-state checkpointing (orbax).

The render side checkpoints partial images (driver.py, atomic npz); this
module checkpoints the TRAINING state — (params, opt_state, step) — via
orbax, the production JAX checkpointing library: atomic directory
commits, async-safe, multi-host aware (every process must call save/
restore; orbax coordinates the commit). The reference has no training,
so there is no counterpart to cite (SURVEY.md §5 checkpoint/resume:
"Absent").
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax


def _mgr(path: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(path),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True),
    )


def save_train_state(path: str, step: int, params: Any,
                     opt_state: Any = None,
                     max_to_keep: int = 3) -> None:
    """Atomically save (params, opt_state) at `step` under `path`.
    Keeps the newest `max_to_keep` steps."""
    import orbax.checkpoint as ocp

    with _mgr(path, max_to_keep) as mgr:
        state = {"params": params}
        if opt_state is not None:
            state["opt_state"] = opt_state
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def restore_train_state(
    path: str,
    params_like: Any,
    opt_state_like: Any = None,
    step: Optional[int] = None,
) -> Tuple[int, Any, Any]:
    """Restore (step, params, opt_state) from `path`. `*_like` provide
    the tree structure/shapes/dtypes (e.g. freshly initialized state).
    `step=None` restores the latest step."""
    import orbax.checkpoint as ocp

    with _mgr(path) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint steps under {path}")
        target = {"params": params_like}
        if opt_state_like is not None:
            target["opt_state"] = opt_state_like
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x,
            target,
        )
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(abstract))
    return step, restored["params"], restored.get("opt_state")
