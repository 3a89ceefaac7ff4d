"""Multi-host runtime init — replaces the reference's NCCL process-group
setup (reference: owl_wms/utils/ddp.py:5-28).

On TPU pods, ``jax.distributed.initialize()`` discovers peers from the
environment; single-host runs need nothing. Mirrors the reference's
swallow-failure-and-run-single-device behavior (ddp.py:8-17).
"""

from __future__ import annotations

import logging

import jax

log = logging.getLogger(__name__)

_INITIALIZED = False


def init_distributed(coordinator_address: str = None, num_processes: int = None,
                     process_id: int = None) -> tuple:
    """Returns (process_index, local_device_ids, process_count) — the
    analogue of the reference's (global_rank, local_rank, world_size)."""
    global _INITIALIZED
    if not _INITIALIZED and (coordinator_address or num_processes):
        try:
            import os
            if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
                # cross-process CPU collectives need an explicit backend
                # (used by the multi-host CPU test harness; TPU pods use
                # the ICI/DCN fabric and ignore this)
                jax.config.update(
                    "jax_cpu_collectives_implementation", "gloo")
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
            _INITIALIZED = True
        except Exception as e:  # single-process fallback, like ddp.py:14-17
            log.warning("distributed init failed (%s); single-process run", e)
    return jax.process_index(), jax.local_devices(), jax.process_count()


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def cleanup():
    """Parity with reference cleanup() (ddp.py:26-28); jax needs nothing."""
    pass


def broadcast_from_main(tree):
    """Broadcast a pytree from process 0 to all processes — the analogue of
    the reference's dist.broadcast(buf, 0) buffer sync
    (owl_wms/trainers/rft_trainer.py:126-137) and rollout_frames broadcast
    (sf_vid_only.py:139-142). No-op on a single process."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(tree)
