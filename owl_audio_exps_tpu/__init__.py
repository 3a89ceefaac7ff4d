"""owl_audio_exps_tpu — TPU-native (JAX/XLA/Pallas/pjit) world-model
framework with the capabilities of shahbuland/owl-audio-exps (owl_wms).

Layer map mirrors the reference (see SURVEY.md §1): configs -> nn ->
models -> sampling -> data -> trainers -> entry points, with TPU-native
parallelism (jax.sharding over a device Mesh) replacing DDP/NCCL.
"""

__version__ = "0.1.0"

from .configs import Config, ConfigNode, transformer_config  # noqa: F401


def from_pretrained(cfg_path: str, ckpt_path: str = None,
                    return_decoder: bool = False):
    """Load (config, params[, decoder]) from a YAML + checkpoint
    (reference: owl_wms/__init__.py:9-23). Torch reference checkpoints
    (.pt) are imported transparently."""
    cfg = Config.from_yaml(cfg_path)
    params = None
    if ckpt_path is not None:
        if ckpt_path.endswith((".pt", ".pth")):
            from .utils.torch_import import (load_torch_file,
                                             import_torch_state_dict)
            params = import_torch_state_dict(load_torch_file(ckpt_path),
                                             cfg.model.n_heads)
        else:
            from .utils.checkpoints import load_checkpoint
            state = load_checkpoint(ckpt_path)
            params = state.get("ema_params", state.get("params"))
    if return_decoder:
        from .utils.owl_vae_bridge import get_decoder_only
        decoder = get_decoder_only(cfg.train.vae_id,
                                   cfg.train.get("vae_cfg_path"),
                                   cfg.train.get("vae_ckpt_path"),
                                   latent_channels=cfg.model.channels)
        return cfg, params, decoder
    return cfg, params
