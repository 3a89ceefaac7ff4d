"""dit_v4-scale training-step benchmark (splash attention, remat)."""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
from functools import partial
import jax, jax.numpy as jnp, optax
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.gamerft import GameRFT
from owl_audio_exps_tpu.utils.mfu import MFUProfiler

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 256
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
OPT = sys.argv[3] if len(sys.argv) > 3 else "adamw"  # adamw | muon

# OWL_GEOM=5b -> the reference's dit_v4_5B geometry (36L x 20H x 2560d,
# /root/reference/configs/dit_v4_5B.yml:6-8); OWL_GEOM=av -> the AV
# flagship (av_v4_8x8: tokens_per_frame=65, joint audio token); default
# dit_v4 (16L x 1536d)
GEOM = os.environ.get("OWL_GEOM", "v4")
n_layers, n_heads, d_model = (36, 20, 2560) if GEOM == "5b" else (
    (24, 24, 1536) if GEOM == "av" else (16, 24, 1536))
# bf16 master params: halves param+update memory; needed to fit the 2.8B
# 5B geometry's optimizer state on one 16 GB chip
PARAMS_BF16 = os.environ.get("OWL_PARAMS_BF16") == "1"

AV = GEOM == "av"
cfg = transformer_config(
    model_id="game_rft_audio" if AV else "game_rft",
    sample_size=8, channels=128, n_layers=n_layers,
    n_heads=n_heads, d_model=d_model,
    tokens_per_frame=65 if AV else 64, n_buttons=11, n_mouse_axes=2,
    audio_channels=64,
    cfg_prob=0.1, n_frames=max(N_FRAMES, 256), causal=True, uncond=False,
    backbone="dit", has_audio=AV, rope_impl="ortho" if AV else "motion",
    local_window=16, global_window=None, gradient_checkpointing=True,
    # group-granular remat: 4x fewer saved residuals — required to fit
    # the 1536-frame (98,304-token) reference config on one v5e chip
    remat_granularity=os.environ.get("OWL_REMAT", "group"),
    splash_head_chunks=int(os.environ.get("OWL_SPLASH_HEAD_CHUNKS", "1")),
    mlp_chunks=int(os.environ.get("OWL_MLP_CHUNKS", "1")),
    remat_sequenced=os.environ.get("OWL_REMAT_SEQ") == "1",
    local_attn_impl=os.environ.get("OWL_LOCAL_ATTN", "auto"),
    scan_layers=os.environ.get("OWL_SCAN_LAYERS") == "1")
if AV:
    from owl_audio_exps_tpu.models.gamerft_audio import GameRFTAudio
    model = GameRFTAudio(cfg, dtype=jnp.bfloat16)
else:
    model = GameRFT(cfg, dtype=jnp.bfloat16)
rs = np.random.RandomState(0)
x = jnp.asarray(rs.randn(B, N_FRAMES, 128, 8, 8), jnp.bfloat16)
audio = jnp.asarray(rs.randn(B, N_FRAMES, 64), jnp.bfloat16)
mouse = jnp.asarray(rs.randn(B, N_FRAMES, 2), jnp.bfloat16)
btn = jnp.asarray(rs.rand(B, N_FRAMES, 11) > 0.5, jnp.bfloat16)
model_args = (x, audio, mouse, btn) if AV else (x, mouse, btn)
if PARAMS_BF16:
    # fit probe: flax init materializes the whole f32 tree before any
    # cast can fuse (measured 23.4 GB program for the 2.8B 5B geometry).
    # Instead take shapes from eval_shape (zero memory) and fill each
    # leaf directly in bf16 — peak = final tree + one leaf. Init
    # distribution is irrelevant for a throughput/fit probe.
    tree = jax.eval_shape(
        lambda k: model.init({"params": k, "noise": jax.random.key(1)},
                             *model_args)["params"],
        jax.random.key(0))
    leaves, treedef = jax.tree.flatten(tree)
    fill = jax.jit(lambda k, i: 0.02 * jax.random.normal(
        jax.random.fold_in(k, i), leaves[i].shape, jnp.bfloat16),
        static_argnums=1)
    key = jax.random.key(0)
    params = jax.tree.unflatten(
        treedef, [fill(key, i) for i in range(len(leaves))])
else:
    params = jax.jit(lambda k: model.init(
        {"params": k, "noise": jax.random.key(1)}, *model_args)["params"]
    )(jax.random.key(0))
if OPT.lower() == "muon":
    # the optimizer the reference actually trains with
    # (owl_wms/muon.py:117-176 CombinedOptimizer); one momentum slot
    from owl_audio_exps_tpu.muon import init_muon
    mom_dtype = jnp.bfloat16 if os.environ.get("OWL_MUON_BF16") == "1" \
        else None
    tx = init_muon(params, lr=1e-4, momentum=0.95, adamw_lr=1e-4,
                   adamw_keys=["t_embed", "control_embed", "proj_in",
                               "proj_out", "adaln", "gate"],
                   momentum_dtype=mom_dtype)
elif OPT.lower() in ("sgd", "fusedsgd"):
    # stateless: for fit probes of geometries whose optimizer slots
    # don't fit single-chip (dit_v4_5B spot check — on a pod the state
    # shards via the fsdp axis, tests/test_multichip_dryrun.py).
    # fusedsgd applies p - lr*g directly in the step: optax.sgd's
    # update tree materialized a third full-param tensor set (measured
    # +5.7 GB at 5B geometry — the 19.8 GB OOM in docs/LONGCTX.md)
    tx = optax.sgd(1e-4)
elif OPT.lower() == "adamw_lowmem":
    # bf16 moments: same memory class as Muon's single bf16 slot, so
    # the optimizer A/B runs at equal context (f32 adamw OOMs by 140 MB
    # at 1024 frames)
    from owl_audio_exps_tpu.muon import adamw_lowmem
    tx = adamw_lowmem(1e-4)
else:
    tx = optax.adamw(1e-4)
opt = tx.init(params) if OPT.lower() != "fusedsgd" else ()

def loss_fn(p, rng):
    out = model.apply({"params": p}, *model_args, rngs={"noise": rng})
    # the AV wrapper returns (video_loss, audio_loss)-style pytrees;
    # reduce whatever comes back to one scalar
    return jax.tree.reduce(lambda a, b: a + b,
                           jax.tree.map(jnp.mean, out))

GRADS_BF16 = os.environ.get("OWL_GRADS_BF16") == "1"


@partial(jax.jit, donate_argnums=(0, 1))
def step(p, o, rng):
    loss, g = jax.value_and_grad(loss_fn)(p, rng)
    if GRADS_BF16:
        # cast fuses into the backward's final grad accumulation: grad
        # buffers materialize at half size (Muon NS5 is bf16 anyway)
        g = jax.tree.map(lambda x: x.astype(jnp.bfloat16), g)
    if OPT.lower() == "fusedsgd":
        p = jax.tree.map(
            lambda a, b: (a - 1e-4 * b.astype(a.dtype)).astype(a.dtype),
            p, g)
        return p, o, loss
    up, o = tx.update(g, o, p)
    return optax.apply_updates(p, up), o, loss

t0 = time.perf_counter()
params, opt, loss = step(params, opt, jax.random.key(2))
jax.block_until_ready(loss)
print("compile+first %.1fs, loss=%.4f" % (time.perf_counter()-t0, float(loss)))
times = []
for i in range(3):
    t0 = time.perf_counter()
    params, opt, loss = step(params, opt, jax.random.key(3+i))
    jax.block_until_ready(loss)
    times.append(time.perf_counter()-t0)
wall = float(np.median(times))
tokens = B * N_FRAMES * cfg.tokens_per_frame
prof = MFUProfiler(cfg, batch_tokens=tokens,
                   seq_len=N_FRAMES * cfg.tokens_per_frame, training=True)
tflops = prof.flops_per_step / wall / 1e12
print("frames=%d batch=%d: %.3f s/step, %.0f tokens/s, %.1f TFLOP/s, MFU=%.1f%%"
      % (N_FRAMES, B, wall, tokens/wall, tflops, 100*tflops/197.0))
