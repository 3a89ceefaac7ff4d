"""owl_audio_exps_tpu — TPU-native (JAX/XLA/Pallas/pjit) world-model
framework with the capabilities of shahbuland/owl-audio-exps (owl_wms).

Layer map mirrors the reference (see SURVEY.md §1): configs -> nn ->
models -> sampling -> data -> trainers -> entry points, with TPU-native
parallelism (jax.sharding over a device Mesh) replacing DDP/NCCL.
"""

__version__ = "0.1.0"

from .configs import Config, ConfigNode, transformer_config  # noqa: F401


def from_pretrained(cfg_path: str, ckpt_path: str = None):
    """Load (config, params) from a YAML + checkpoint
    (reference: owl_wms/__init__.py:9-23)."""
    from .utils.checkpoints import load_checkpoint

    cfg = Config.from_yaml(cfg_path)
    params = None
    if ckpt_path is not None:
        state = load_checkpoint(ckpt_path)
        params = state.get("ema_params", state.get("params"))
    return cfg, params
