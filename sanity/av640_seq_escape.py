"""The 640-frame AV scheduler cliff's mesh escape (VERDICT r2 item 4).

Single-chip, the av_v4_8x8 geometry falls off a scheduler cliff at 640
frames (PERF.md: 25.9 s/step, 5-7x per-token cost — the barely-fitting
program serializes spills). The escape is the `seq` mesh axis: context
parallelism shards the 41,600-token stream over chips (10,400
tokens/chip at seq=4), restoring the per-chip working set of the
well-behaved 160-frame regime.

This driver PROVES the escape path compiles and trains at the true
640-frame sequence length on the 8-device virtual CPU mesh (scaled-down
width — CPU FLOPs — same axes: seq CP + scan_layers + group remat):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python sanity/av640_seq_escape.py [n_frames] [d_model]
"""
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
# hard override: the container exports JAX_PLATFORMS=axon (one real TPU
# chip); this driver is a virtual-8-device CPU mesh demo
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402
import jax  # noqa: E402

# the env var alone does NOT suppress the pre-registered axon PJRT
# plugin (a sitecustomize registers it at interpreter start) — without
# this config override jax.devices() still returns the real TPU chip
# and splash_available() routes the CP partials into the non-interpret
# Pallas kernel, which cannot lower on the CPU backend
jax.config.update("jax_platforms", "cpu")

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 640
D_MODEL = int(sys.argv[2]) if len(sys.argv) > 2 else 128

from owl_audio_exps_tpu.configs import Config  # noqa: E402
from owl_audio_exps_tpu.trainers import get_trainer_cls  # noqa: E402

cfg = Config.from_dict({
    "model": {
        # av_v4_8x8 axes at CPU-runnable width: tokens_per_frame=65
        # (64 video + 1 audio), 3:1 local/global, causal, seq-CP
        "model_id": "game_rft_audio", "sample_size": 8, "channels": 8,
        "audio_channels": 8, "n_layers": 4, "n_heads": 2,
        "d_model": D_MODEL, "tokens_per_frame": 65, "n_buttons": 11,
        "n_mouse_axes": 2, "cfg_prob": 0.0, "n_frames": N_FRAMES,
        "causal": True, "uncond": False, "backbone": "dit",
        "has_audio": True, "rope_impl": "ortho", "local_window": 16,
        "global_window": None, "sequence_parallel": True,
        "gradient_checkpointing": True, "remat_granularity": "group",
        "scan_layers": True,
    },
    "train": {
        "trainer_id": "av", "data_id": "synthetic_av",
        "data_kwargs": {"window_length": N_FRAMES, "channels": 8,
                        "audio_channels": 8, "sample_size": 8,
                        "n_buttons": 11},
        "target_batch_size": 2, "batch_size": 2, "epochs": 1,
        "opt": "AdamW", "opt_kwargs": {"lr": 1e-4}, "scheduler": None,
        "checkpoint_dir": "/tmp/av640_ckpt", "save_interval": 10 ** 6,
        "sample_interval": 10 ** 6, "log_interval": 1,
        "vae_scale": 1.0, "audio_vae_scale": 1.0,
        "mesh": {"data": 2, "seq": 4},
    },
    "wandb": {"run_name": f"av640_seq_escape_{N_FRAMES}"},
})

trainer = get_trainer_cls("av")(cfg)
print(f"mesh: {dict(trainer.mesh.shape)}  tokens="
      f"{N_FRAMES * 65} ({N_FRAMES} frames x 65), "
      f"{N_FRAMES * 65 // 4} tokens per seq shard")
t0 = time.time()
state = trainer.train(max_steps=2)
print(f"2 steps in {time.time() - t0:.1f}s (incl. compile) — "
      "640-frame AV trains under the seq axis")
for leaf in jax.tree.leaves(state.params):
    assert np.isfinite(np.asarray(leaf)).all()
print("params finite: OK")
