"""Checkpoint save/load via Orbax.

Replaces the reference's rank-0 torch.save of
{model, ema, opt, steps} (reference: owl_wms/trainers/base.py:61-75) with
sharding-aware async-capable Orbax checkpoints; the legacy prefix-regex
normalization (rft_trainer.py:84-92, utils/__init__.py:21-62) disappears
with pytree-structured state — ``versatile_load`` here only needs to pick
the right subtree.
"""

from __future__ import annotations

import os
import atexit
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


_SHARED_CKPTR = None


def _ckptr() -> ocp.StandardCheckpointer:
    global _SHARED_CKPTR
    if _SHARED_CKPTR is None:
        _SHARED_CKPTR = ocp.StandardCheckpointer()
    return _SHARED_CKPTR


def _close_shared() -> None:
    """atexit: orbax Checkpointers own a NON-daemon metadata-store
    executor thread (metadata_store_0) that blocks interpreter teardown
    if never closed — the round-4 pytest exit hang (tests/conftest.py
    diagnosed it). Closing here fixes every consumer: trainers, tests,
    scripts."""
    global _SHARED_CKPTR
    if _SHARED_CKPTR is not None:
        try:
            _SHARED_CKPTR.close()
        except Exception:
            pass
        _SHARED_CKPTR = None


atexit.register(_close_shared)


def save_checkpoint(path: str, state: Dict[str, Any],
                    wait: bool = True) -> None:
    """state: {'params', 'ema_params', 'opt_state', 'step', ...} pytrees.
    With ``wait=False`` the save is asynchronous (orbax background thread);
    call ``wait_for_checkpoints()`` before exiting."""
    path = os.path.abspath(path)
    ckptr = _ckptr()
    ckptr.wait_until_finished()  # at most one async save in flight
    ckptr.save(path, state, force=True)
    if wait:
        ckptr.wait_until_finished()


def wait_for_checkpoints() -> None:
    if _SHARED_CKPTR is not None:
        _SHARED_CKPTR.wait_until_finished()


def load_checkpoint(path: str, template: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
    path = os.path.abspath(path)
    ckptr = _ckptr()
    if template is not None:
        return ckptr.restore(path, template)
    return ckptr.restore(path)


def save_clean_export(path: str, ema_params) -> None:
    """EMA-only export for inference (reference: base.py:67-72
    output_path with prefix stripping)."""
    save_checkpoint(path, {"params": ema_params})


def versatile_load(path: str, template=None):
    """Load a checkpoint and return inference params, preferring the EMA
    subtree (reference: owl_wms/utils/__init__.py:21-62)."""
    state = load_checkpoint(path, template)
    for key in ("ema_params", "params"):
        if isinstance(state, dict) and key in state:
            return state[key]
    return state


def latest_step_dir(checkpoint_dir: str) -> Optional[str]:
    """Find the newest step_N checkpoint in a directory."""
    if not os.path.isdir(checkpoint_dir):
        return None
    steps = []
    for name in os.listdir(checkpoint_dir):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_")[1]), name))
            except (IndexError, ValueError):
                pass
    if not steps:
        return None
    return os.path.join(checkpoint_dir, max(steps)[1])
