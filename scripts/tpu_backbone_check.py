"""On-chip verification of the alternate backbones (mmdit, uvit).

The DiT backbone is exercised by every perf bench; MMDiT (dual-stream,
reference: owl_wms/nn/mmattn.py) and UViT (skip connections, reference:
owl_wms/nn/attn.py:194-260) had only ever run on the virtual CPU mesh.
This script runs each through REAL AV-trainer steps on the attached TPU
(small-but-real model, synthetic AV latents) with finite-param asserts,
plus an on-chip MMDiT cached-decode vs full-forward closeness check
(the decode path routes through the TPU cached-attention kernels, which
CPU tests only cover in interpret/dense mode).

Run: python scripts/tpu_backbone_check.py   (~5 min incl. compiles)
"""
import sys, pathlib, os, time, gc

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.configs import Config, transformer_config
from owl_audio_exps_tpu.trainers import get_trainer_cls

MODEL = {
    "model_id": "game_rft_audio", "n_layers": 8, "n_heads": 8,
    "d_model": 512, "channels": 16, "audio_channels": 16,
    "sample_size": 4, "tokens_per_frame": 17, "n_frames": 32,
    "n_buttons": 8, "causal": True, "uncond": False, "has_audio": True,
    "rope_impl": "ortho", "local_window": 8, "global_window": None,
    "cfg_prob": 0.1,
}

TRAIN = {
    "trainer_id": "av", "data_id": "synthetic_av",
    "data_kwargs": {"window_length": 32, "channels": 16,
                    "audio_channels": 16, "sample_size": 4,
                    "n_buttons": 8},
    "target_batch_size": 2, "batch_size": 2, "epochs": 1,
    "opt": "AdamW", "opt_kwargs": {"lr": 1e-4},
    "checkpoint_dir": "/tmp/owl_backbone_ckpt", "save_interval": 10_000,
    "sample_interval": 10_000, "vae_scale": 1.0,
}


def run_trainer(backbone, steps=3):
    cfg = Config.from_dict({
        "model": dict(MODEL, backbone=backbone),
        "train": dict(TRAIN),
        "wandb": {"run_name": f"tpu_backbone_{backbone}"}})
    trainer = get_trainer_cls("av")(cfg)
    t0 = time.perf_counter()
    state = trainer.train(max_steps=steps)
    wall = time.perf_counter() - t0
    assert int(state.step) == steps
    for leaf in jax.tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all(), \
            f"{backbone}: non-finite params"
    print(f"PASS av-trainer backbone={backbone:6s} {steps} steps on "
          f"{jax.devices()[0].platform} ({wall:.1f}s incl. compile)",
          flush=True)
    del trainer, state
    gc.collect()


def mmdit_decode_check():
    """Cached single-frame decode must match the full bidirectional-
    context forward on the LAST frame (causal model), on the chip's
    cached-attention kernels, in the serve dtype (bf16)."""
    from owl_audio_exps_tpu.models.gamerft_audio import GameRFTAudioCore
    from owl_audio_exps_tpu.nn.kv_cache import KVCache

    cfg = transformer_config(**dict(MODEL, backbone="mmdit", cfg_prob=0.0))
    core = GameRFTAudioCore(cfg, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    n = 24
    x = jnp.asarray(rs.randn(1, n, 16, 4, 4), jnp.bfloat16)
    audio = jnp.asarray(rs.randn(1, n, 16), jnp.bfloat16)
    t = jnp.asarray(rs.rand(1, n), jnp.bfloat16)
    mouse = jnp.asarray(rs.randn(1, n, 2), jnp.bfloat16)
    btn = jnp.asarray((rs.rand(1, n, 8) > 0.5), jnp.bfloat16)
    params = core.init(jax.random.key(0), x, audio, t, mouse, btn)

    (fv, fa), _ = jax.jit(lambda p: core.apply(
        p, x, audio, t, mouse, btn))(params)

    cache = KVCache.from_config(cfg, batch_size=1, dtype=jnp.bfloat16)

    def prefill(p, c):
        return core.apply(p, x[:, :n - 1], audio[:, :n - 1], t[:, :n - 1],
                          mouse[:, :n - 1], btn[:, :n - 1],
                          kv_cache=c, write=True)[1]

    cache = jax.jit(prefill)(params, cache)

    def decode(p, c):
        (lv, la), _ = core.apply(p, x[:, n - 1:], audio[:, n - 1:],
                                 t[:, n - 1:], mouse[:, n - 1:],
                                 btn[:, n - 1:], kv_cache=c, decoding=True)
        return lv, la

    lv, la = jax.jit(decode)(params, cache)
    dv = float(jnp.abs(lv[:, 0].astype(jnp.float32)
                       - fv[:, -1].astype(jnp.float32)).max())
    da = float(jnp.abs(la[:, 0].astype(jnp.float32)
                       - fa[:, -1].astype(jnp.float32)).max())
    assert dv < 0.05 and da < 0.05, (dv, da)
    print(f"PASS mmdit cached-decode on-chip: max|dv|={dv:.4f} "
          f"max|da|={da:.4f} (bf16)", flush=True)


run_trainer("mmdit")
run_trainer("uvit")
mmdit_decode_check()
print("PASS backbones on-chip")
