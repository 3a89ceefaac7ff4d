"""Flagship AV streaming serve benchmark: KV-cached joint (frame, audio)
ticks vs the reference-parity window-recompute pipeline.

Geometry = configs/av_v4_8x8.yml (24L x 24H x 1536d, tokens_per_frame=65:
64 video + 1 audio token). The reference serves AV only via full-window
recompute (inference/causvid_pipeline.py:112-163); the cached pipeline is
this framework's addition. Usage:
    python scripts/tpu_av_serve_bench.py [cap_frames] [n_ticks] [steps]
Env: OWL_AV_SERVE_MODE=cached|window|both (default both)
"""
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.gamerft_audio import GameRFTAudioCore

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "inference"))
from pipeline import AVCachedStreamingPipeline, CausvidPipeline

CAP = int(sys.argv[1]) if len(sys.argv) > 1 else 120
N_TICKS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
MODE = os.environ.get("OWL_AV_SERVE_MODE", "both")

cfg = transformer_config(
    model_id="game_rft_audio", sample_size=8, channels=128,
    audio_channels=64, n_layers=24, n_heads=24, d_model=1536,
    tokens_per_frame=65, n_buttons=11, cfg_prob=0.0,
    n_frames=max(2 * CAP + 16, 256), causal=True, uncond=False,
    backbone="dit", has_audio=True, rope_impl="ortho",
    local_window=16, global_window=None,
    kv_quant=os.environ.get("OWL_KV_QUANT") or None)
core = GameRFTAudioCore(cfg, dtype=jnp.bfloat16)
rs = np.random.RandomState(0)
init_len = 8
x = jnp.asarray(rs.randn(1, init_len, 128, 8, 8), jnp.bfloat16)
a = jnp.asarray(rs.randn(1, init_len, 64), jnp.bfloat16)
t0 = jnp.zeros((1, init_len), jnp.bfloat16)
m = jnp.asarray(rs.randn(1, init_len, 2), jnp.bfloat16)
b = jnp.asarray(rs.rand(1, init_len, 11) > 0.5, jnp.bfloat16)
params = core.init(jax.random.key(0), x, a, t0, m, b)
params = jax.tree.map(
    lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
    params)
if os.environ.get("OWL_PARAM_QUANT") == "int8":
    from owl_audio_exps_tpu.nn.wquant import quantize_params_int8
    params = {"params": quantize_params_int8(params["params"])}


SESSIONS = int(os.environ.get("OWL_AV_SESSIONS", "1"))


def run_ticks(pipe, n, fetch_each=False, sessions=1):
    """Run n ticks, varying controls per tick.

    Over the axon relay, block_until_ready is effectively async — the
    only honest timings are (a) aggregate wall clock with one hard host
    fetch at the end (sustained throughput) and (b) a host fetch per
    tick (interactive latency incl. the tunnel round-trip).
    """
    times = []
    out = None
    t_all = time.perf_counter()
    for i in range(n):
        mouse = np.asarray([0.1 * ((i % 7) - 3), 0.05 * ((i % 5) - 2)])
        btn = (np.arange(11) % (2 + i % 3) == 0).astype(np.float32)
        if sessions > 1:
            mouse = np.stack([mouse * (1 + 0.1 * s)
                              for s in range(sessions)])
            btn = np.tile(btn, (sessions, 1))
        t_start = time.perf_counter()
        out = pipe(mouse, btn)
        if fetch_each:
            np.asarray(out[0])
        times.append(time.perf_counter() - t_start)
    np.asarray(out[0])
    return times, (time.perf_counter() - t_all) / n


if MODE in ("cached", "both"):
    pipe = AVCachedStreamingPipeline(core, params, cfg, window_frames=CAP,
                                     sampling_steps=STEPS,
                                     n_sessions=SESSIONS)
    if SESSIONS > 1:
        tile = lambda v, r: jnp.tile(v, (SESSIONS,) + (1,) * (r - 1))
        pipe.prime(tile(x, 5), tile(a, 3), tile(m, 3), tile(b, 3))
    else:
        pipe.prime(x, a, m, b)
    t_start = time.perf_counter()
    run_ticks(pipe, 2, sessions=SESSIONS)  # compile
    print("cached compile+2 ticks %.1fs" % (time.perf_counter() - t_start))
    _, agg = run_ticks(pipe, N_TICKS, sessions=SESSIONS)
    lat, _ = run_ticks(pipe, max(N_TICKS // 4, 8), fetch_each=True,
                       sessions=SESSIONS)
    med = float(np.median(lat))
    print("CACHED AV serve cap=%d steps=%d sessions=%d: sustained %.1f "
          "ms/tick (%.2f ticks/s agg %.1f session-ticks/s); per-tick host "
          "fetch %.1f ms p50, %.1f p90"
          % (CAP, STEPS, SESSIONS, 1e3 * agg, 1.0 / agg, SESSIONS / agg,
             1e3 * med, 1e3 * float(np.percentile(lat, 90))))

if MODE in ("window", "both"):
    wpipe = CausvidPipeline(core, params, cfg, window_length=60,
                            sampling_steps=STEPS)
    t_start = time.perf_counter()
    run_ticks(wpipe, 2)  # compile
    print("window compile+2 ticks %.1fs" % (time.perf_counter() - t_start))
    _, agg = run_ticks(wpipe, max(N_TICKS // 4, 8))
    print("WINDOW AV serve W=60 steps=%d (reference-parity recompute): "
          "sustained %.1f ms/tick (%.2f ticks/s)"
          % (STEPS, 1e3 * agg, 1.0 / agg))
