"""Device mesh construction — the TPU-native replacement for the
reference's NCCL/DDP runtime (reference: owl_wms/utils/ddp.py; SURVEY.md
§2.8).

One global mesh with axes ``('data', 'fsdp', 'tensor')``:

* ``data``   — pure data parallelism (gradient psum), the reference-parity
  baseline (DDP ≡ batch sharded over data x fsdp, params replicated).
* ``fsdp``   — parameter/optimizer sharding (ZeRO-ish; generalizes the
  reference Muon round-robin, owl_wms/muon.py:95-115).
* ``tensor`` — megatron-style tensor parallelism over heads / MLP hidden.

Collectives ride ICI within a slice and DCN across slices — XLA inserts
them from sharding annotations; there is no NCCL-env-var layer to port.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH: Optional[Mesh] = None

AXIS_DATA = "data"
AXIS_FSDP = "fsdp"
AXIS_TENSOR = "tensor"


@dataclass
class MeshConfig:
    data: int = -1     # -1: all remaining devices
    fsdp: int = 1
    tensor: int = 1


def make_mesh(mesh_cfg: MeshConfig = None, devices=None) -> Mesh:
    """Create (and install as default) the global mesh."""
    global _MESH
    mesh_cfg = mesh_cfg or MeshConfig()
    if devices is None:
        devices = jax.devices()
        needed = max(mesh_cfg.fsdp * mesh_cfg.tensor,
                     mesh_cfg.data * mesh_cfg.fsdp * mesh_cfg.tensor)
        if len(devices) < needed:
            # multi-device request on a single-accelerator host: fall back
            # to the virtual CPU mesh (xla_force_host_platform_device_count)
            try:
                cpu = jax.devices("cpu")
                if len(cpu) >= needed:
                    devices = cpu
            except RuntimeError:
                pass
    n = len(devices)
    fsdp, tensor = mesh_cfg.fsdp, mesh_cfg.tensor
    data = mesh_cfg.data if mesh_cfg.data > 0 else n // (fsdp * tensor)
    assert data * fsdp * tensor == n, (
        f"mesh {data}x{fsdp}x{tensor} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, fsdp, tensor)
    _MESH = Mesh(dev_array, (AXIS_DATA, AXIS_FSDP, AXIS_TENSOR))
    return _MESH


def get_mesh() -> Mesh:
    global _MESH
    if _MESH is None:
        make_mesh()
    return _MESH


def batch_sharding(mesh: Mesh = None) -> NamedSharding:
    """Batch axis sharded over data x fsdp (DP parity with the reference)."""
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P((AXIS_DATA, AXIS_FSDP)))


def replicated(mesh: Mesh = None) -> NamedSharding:
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P())
