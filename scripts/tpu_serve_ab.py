"""A/B: sampler-in-one-scan vs donated-tick host loop for streaming video.

The round-2 open question (docs/ROUND2_NOTES.md): per-forward decode cost
is ~1 ms but the scan-carried split-ring cache adds ~19 ms/frame at
cap=120. Candidate fix is the CachedStreamingPipeline pattern — a jitted
per-frame tick with the cache donated, driven from a host loop.
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from functools import partial
from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.gamerft import GameRFTCore
from owl_audio_exps_tpu.nn.kv_cache import KVCache
from owl_audio_exps_tpu.sampling.av_caching import AVCachingSamplerV2

CAP = int(sys.argv[1]) if len(sys.argv) > 1 else 120
N_GEN = int(sys.argv[2]) if len(sys.argv) > 2 else 16
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
SPLIT = os.environ.get("OWL_SPLIT_CACHE", "auto")
SPLIT = SPLIT if SPLIT == "auto" else SPLIT == "1"

cfg = transformer_config(
    model_id="game_rft", sample_size=8, channels=128, n_layers=16,
    n_heads=24, d_model=1536, tokens_per_frame=64, n_buttons=11,
    cfg_prob=0.0, n_frames=max(CAP + N_GEN + 8, 256), causal=True,
    uncond=False, backbone="dit", has_audio=False, rope_impl="motion",
    local_window=16, global_window=None, split_local_cache=SPLIT)
core = GameRFTCore(cfg, dtype=jnp.bfloat16)
rs = np.random.RandomState(0)
init_len = 8
total = init_len + N_GEN
x = jnp.asarray(rs.randn(1, init_len, 128, 8, 8), jnp.bfloat16)
mouse = jnp.asarray(rs.randn(1, total, 2), jnp.bfloat16)
btn = jnp.asarray(rs.rand(1, total, 11) > 0.5, jnp.bfloat16)
t0 = jnp.zeros((1, init_len), jnp.bfloat16)
params = core.init(jax.random.key(0), x, t0, mouse[:, :init_len],
                   btn[:, :init_len])
params = {"params": params["params"]}
dt_sched = [1.0, 0.5] if STEPS == 2 else None

# ---------------------------------------------------------------- A: scan
sampler = AVCachingSamplerV2(n_steps=STEPS, cfg_scale=1.0, num_frames=N_GEN,
                             noise_prev=0.2, max_window=CAP,
                             custom_schedule=dt_sched)
t_start = time.perf_counter()
out = sampler(core, params, x, mouse, btn, jax.random.key(1))
np.asarray(out)
print("A scan: compile+run %.1fs" % (time.perf_counter() - t_start))
times = []
for i in range(3):
    t_start = time.perf_counter()
    out = sampler(core, params, x, mouse, btn, jax.random.key(2 + i))
    np.asarray(out)
    times.append(time.perf_counter() - t_start)
wall = float(np.median(times))
print("A scan      cap=%d gen=%d steps=%d: %.2f f/s (%.1f ms/frame)"
      % (CAP, N_GEN, STEPS, N_GEN / wall, 1e3 * wall / N_GEN))

# ------------------------------------------------------- B: host-loop tick
from owl_audio_exps_tpu.sampling.schedulers import resolve_schedule
dts = resolve_schedule(STEPS, dt_sched)


# NB: prefill must NOT donate — the axon relay rejects donating a buffer
# that was itself produced by a different donating executable (verified
# /tmp/tick_repro*.py: donate-prefill -> donate-tick dies INVALID_ARGUMENT;
# plain prefill -> donate-tick chains run fine, incl. tick->tick).
@jax.jit
def prefill(p, cache, noisy_ctx, t_ctx, m, b):
    _, cache = core.apply(p, noisy_ctx, t_ctx, m, b, kv_cache=cache,
                          write=True)
    return cache


@partial(jax.jit, donate_argnums=(1,))
def tick(p, cache, rng, idx):
    m1 = jax.lax.dynamic_slice_in_dim(mouse, init_len + idx, 1, axis=1)
    b1 = jax.lax.dynamic_slice_in_dim(btn, init_len + idx, 1, axis=1)
    rng, r_init, r_renoise = jax.random.split(rng, 3)
    cur = jax.random.normal(r_init, (1, 1, 128, 8, 8),
                            jnp.float32).astype(jnp.bfloat16)
    t = jnp.ones((1, 1), jnp.bfloat16)
    for i in range(STEPS):
        pred, _ = core.apply(p, cur, t, m1, b1, kv_cache=cache,
                             decoding=True)
        cur = (cur.astype(jnp.float32)
               - float(dts[i]) * pred.astype(jnp.float32)).astype(cur.dtype)
        t = (t.astype(jnp.float32) - float(dts[i])).astype(t.dtype)
    z = jax.random.normal(r_renoise, cur.shape, jnp.float32)
    noisy = (cur.astype(jnp.float32) * 0.8 + z * 0.2).astype(cur.dtype)
    _, cache = core.apply(p, noisy, jnp.full_like(t, 0.2), m1, b1,
                          kv_cache=cache, write=True, decoding=True)
    return cache, rng, cur


def run_host(seed):
    cache = KVCache.from_config(cfg, 1, capacity_frames=CAP,
                                dtype=jnp.bfloat16)
    rng = jax.random.key(seed)
    rng, r_ctx = jax.random.split(rng)
    z = jax.random.normal(r_ctx, x.shape, jnp.float32)
    noisy_ctx = (x.astype(jnp.float32) * 0.8 + z * 0.2).astype(x.dtype)
    t_ctx = jnp.full((1, init_len), 0.2, jnp.bfloat16)
    cache = prefill(params, cache, noisy_ctx, t_ctx,
                    mouse[:, :init_len], btn[:, :init_len])
    frames = []
    for i in range(N_GEN):
        cache, rng, cur = tick(params, cache, rng, np.int32(i))
        frames.append(cur)
    jax.block_until_ready(frames[-1])
    return frames


t_start = time.perf_counter()
run_host(1)
print("B host: compile+run %.1fs" % (time.perf_counter() - t_start))
times = []
for i in range(3):
    t_start = time.perf_counter()
    run_host(2 + i)
    times.append(time.perf_counter() - t_start)
wall = float(np.median(times))
print("B host-tick cap=%d gen=%d steps=%d: %.2f f/s (%.1f ms/frame)"
      % (CAP, N_GEN, STEPS, N_GEN / wall, 1e3 * wall / N_GEN))
