"""Benchmark: streaming audio generation real-time factor (RTF).

North star (BASELINE.md): audio-seconds generated per wall-clock second
per chip, >= 1, at the reference audio model scale (configs/audio.yml:
16L x 1024d DiT, 64-ch latents, 1 token per latent, 120 latents = 2 s of
44.1 kHz stereo; each latent spans 1/60 s).

Serve config matches the reference's audio.yml sampler block: 2-step
custom schedule per token, noise_prev 0.2, rolling 120-token window, KV
caching. The whole generation loop is one jitted lax.scan.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"production"}. The recorded metric stays bf16 (matched precision vs the
reference's bf16/fp16 serving); the nested "production" object carries
the deployment configuration's numbers on the same chip — int8
weight-only single-stream RTF and the 32-stream int8-weights +
int8-KV-ring aggregate (audio-sec/sec/chip) — measured in the same run
so the driver records them per round (BASELINE.md production note).
OWL_BENCH_PRODUCTION=0 skips the production rows.
"""

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")

LATENTS_PER_SECOND = 60.0  # 120 latents per 2 s window (BASELINE.md)
NUM_TOKENS = 240


def _measure(sampler, core, params, x, n_iters=3):
    import jax
    out = sampler(core, params, x, jax.random.key(1))
    np.asarray(out)  # warmup/compile with a hard host fetch (PERF.md gotcha 3)
    times = []
    for i in range(n_iters):
        t_start = time.perf_counter()
        out = sampler(core, params, x, jax.random.key(2 + i))
        np.asarray(out)
        times.append(time.perf_counter() - t_start)
    wall = float(np.median(times))
    batch = int(x.shape[0])
    return batch * (NUM_TOKENS / LATENTS_PER_SECOND) / wall


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from owl_audio_exps_tpu.configs import transformer_config
    from owl_audio_exps_tpu.models.audiorft import AudioRFTCore
    from owl_audio_exps_tpu.sampling.audio_caching import AudioCachingSampler

    def make_cfg(**kw):
        return transformer_config(
            model_id="audio_rft", sample_size=120, channels=64,
            n_layers=16, n_heads=16, d_model=1024,
            tokens_per_frame=1, n_frames=4096,
            cfg_prob=0.0, causal=True, uncond=True, backbone="dit",
            has_audio=True, rope_impl="audio1d",
            local_window=16, global_window=None, **kw)

    cfg = make_cfg()
    core = AudioRFTCore(cfg, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    init_len = 120
    x = jnp.asarray(rs.randn(1, init_len, cfg.channels), jnp.bfloat16)
    t0 = jnp.zeros((1, init_len), jnp.bfloat16)
    params = core.init(jax.random.key(0), x, t0)
    # Store params in bf16 — identical numerics (compute dtype is bf16,
    # so flax casts per-op anyway) but halves weight HBM traffic.
    # Measured +1.4% RTF (7.32 vs 7.22, scripts/tpu_bench_bf16_params.py).
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    # OWL_BENCH_QUANT=int8: weight-only int8 serving (nn/wquant.py).
    # Off by default — the recorded metric stays full-precision.
    if os.environ.get("OWL_BENCH_QUANT") == "int8":
        from owl_audio_exps_tpu.nn.wquant import quantize_params_int8
        params = {"params": quantize_params_int8(params["params"])}

    sampler = AudioCachingSampler(
        n_steps=2, num_tokens=NUM_TOKENS, noise_prev=0.2,
        custom_schedule=[1.0, 0.5], max_window=120)

    rtf = _measure(sampler, core, params, x)

    production = {}
    if os.environ.get("OWL_BENCH_PRODUCTION", "1") != "0" \
            and os.environ.get("OWL_BENCH_QUANT") != "int8":
        # Deployment knobs (PERF.md int8 tables): int8 weight-only
        # single-stream, and 32 concurrent streams with int8 weights +
        # int8 KV rings. Failures here never break the recorded metric.
        try:
            from owl_audio_exps_tpu.nn.wquant import quantize_params_int8
            qparams = {"params": quantize_params_int8(params["params"])}
            production["int8_rtf"] = round(
                _measure(sampler, core, qparams, x), 2)

            cfg32 = make_cfg(kv_quant="int8")
            core32 = AudioRFTCore(cfg32, dtype=jnp.bfloat16)
            x32 = jnp.asarray(rs.randn(32, init_len, 64), jnp.bfloat16)
            production["int8_32stream_agg_rtf"] = round(
                _measure(sampler, core32, qparams, x32), 1)
        except Exception as ex:  # pragma: no cover - defensive
            production["error"] = f"{type(ex).__name__}: {str(ex)[:120]}"

    print(json.dumps({
        "metric": "streaming_audio_rtf",
        "value": round(rtf, 4),
        "unit": "audio_sec_per_sec_per_chip",
        "vs_baseline": round(rtf / 1.0, 4),
        "production": production,
    }))


if __name__ == "__main__":
    main()
