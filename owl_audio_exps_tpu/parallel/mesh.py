"""Device mesh construction — the TPU-native replacement for the
reference's NCCL/DDP runtime (reference: owl_wms/utils/ddp.py; SURVEY.md
§2.8).

One global mesh with axes ``('data', 'fsdp', 'tensor', 'seq')``:

* ``data``   — pure data parallelism (gradient psum), the reference-parity
  baseline (DDP ≡ batch sharded over data x fsdp, params replicated).
* ``fsdp``   — parameter/optimizer sharding (ZeRO-ish; generalizes the
  reference Muon round-robin, owl_wms/muon.py:95-115).
* ``tensor`` — megatron-style tensor parallelism over heads / MLP hidden.
* ``seq``    — context parallelism: the token axis shards across chips;
  local-window layers exchange a one-chunk halo, global causal layers
  run ring attention (parallel/context.py). The multi-chip answer to
  the reference's 98,304-token dit_v4 config.
* ``pipe``   — pipeline parallelism: the scan_layers group stack shards
  over stages; microbatched GPipe schedule with ppermute activation
  transfer (parallel/pipeline.py).

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
AXIS_SEQ = "seq"
AXIS_PIPE = "pipe"


@dataclass
class MeshConfig:
    data: int = -1     # -1: all remaining devices
    fsdp: int = 1
    tensor: int = 1
    seq: int = 1       # context parallelism (parallel/context.py)
    pipe: int = 1      # pipeline parallelism (parallel/pipeline.py)
    devices: int = 0   # use only the first N devices (0 = all) — lets a
                       # checkpoint saved on a big mesh restore onto a
                       # smaller topology (cross-topology restore)


def make_mesh(mesh_cfg: MeshConfig = None, devices=None) -> Mesh:
    """Create (and install as default) the global mesh."""
    global _MESH
    mesh_cfg = mesh_cfg or MeshConfig()
    per = mesh_cfg.fsdp * mesh_cfg.tensor * mesh_cfg.seq * mesh_cfg.pipe
    if devices is None:
        devices = jax.devices()
        needed = max(per, mesh_cfg.data * per)
        if len(devices) < needed:
            # multi-device request on a single-accelerator host: fall back
            # to the virtual CPU mesh (xla_force_host_platform_device_count)
            try:
                cpu = jax.devices("cpu")
                if len(cpu) >= needed:
                    devices = cpu
            except RuntimeError:
                pass
    if mesh_cfg.devices:
        assert len(devices) >= mesh_cfg.devices, (
            f"mesh devices={mesh_cfg.devices} > {len(devices)} available")
        devices = devices[:mesh_cfg.devices]
    n = len(devices)
    fsdp, tensor, seq = mesh_cfg.fsdp, mesh_cfg.tensor, mesh_cfg.seq
    pipe = mesh_cfg.pipe
    data = mesh_cfg.data if mesh_cfg.data > 0 else n // per
    assert data * per == n, (
        f"mesh {data}x{fsdp}x{tensor}x{seq}x{pipe} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, fsdp, tensor, seq, pipe)
    _MESH = Mesh(dev_array,
                 (AXIS_DATA, AXIS_FSDP, AXIS_TENSOR, AXIS_SEQ, AXIS_PIPE))
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
