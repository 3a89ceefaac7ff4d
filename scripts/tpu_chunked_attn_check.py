"""On-chip equivalence: head-chunked splash path vs dense attention.

The Attn head-chunked training path (nn/attn.py) runs transpose + QK
rms-norm + RoPE + splash per head slice so the tile-padded full
[B, H, L, Dh] tensors never materialize. Math is unchanged; this checks
the full-model forward against attn_impl=dense on the real chip.
"""
import sys, pathlib, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.gamerft import GameRFTCore

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 32  # 2048 tokens

outs = {}
for name, over in (("dense", dict(attn_impl="dense")),
                   ("splash_hc1", dict(attn_impl="splash",
                                       splash_head_chunks=1)),
                   ("splash_hc4", dict(attn_impl="splash",
                                       splash_head_chunks=4))):
    cfg = transformer_config(
        model_id="game_rft", sample_size=8, channels=128, n_layers=4,
        n_heads=24, d_model=1536, tokens_per_frame=64, n_buttons=11,
        cfg_prob=0.0, n_frames=max(N_FRAMES, 32), causal=True, uncond=False,
        backbone="dit", has_audio=False, rope_impl="motion",
        local_window=16, global_window=None, **over)
    core = GameRFTCore(cfg, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, N_FRAMES, 128, 8, 8), jnp.bfloat16)
    t = jnp.asarray(rs.rand(1, N_FRAMES), jnp.bfloat16)
    mouse = jnp.asarray(rs.randn(1, N_FRAMES, 2), jnp.bfloat16)
    btn = jnp.asarray(rs.rand(1, N_FRAMES, 11) > 0.5, jnp.bfloat16)
    params = core.init(jax.random.key(0), x, t, mouse, btn)
    v, _ = jax.jit(lambda p: core.apply(p, x, t, mouse, btn))(params)
    outs[name] = np.asarray(v, np.float32)
    print(name, "ok", flush=True)

for a, b in (("dense", "splash_hc1"), ("splash_hc1", "splash_hc4"),
             ("dense", "splash_hc4")):
    d = np.max(np.abs(outs[a] - outs[b]))
    print("max|%s - %s| = %.5f" % (a, b, d))
    assert d < 0.03, (a, b, d)
print("CHUNKED ATTN EQUIVALENCE OK")
