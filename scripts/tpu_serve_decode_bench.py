"""End-to-end serve benchmark THROUGH the VAE decoders.

Every PERF.md serve row so far is latent-level; the reference's loop
decodes every tick (inference/causvid_pipeline.py:156-163) and its
audio lives as waveforms. This script measures both serve stacks
waveform/pixels-out and breaks out the decode share:

* audio: bench.py's exact sampler (audio.yml scale, 2-step, 240
  tokens) + AudioVAE decode of the generated latents -> waveform RTF
  incl. decode;
* video: dit_v4-scale av_caching tick (120-frame ring, 2-step) + DCAE
  decode per frame -> f/s incl. decode vs the 16.7 ms/frame budget
  (reference game_cv.py:41).

Decoder weights are random-init (the owl-vaes checkpoints are not
vendored — SURVEY.md intro); conv FLOPs don't depend on weights, so
throughput is representative.

Usage: python scripts/tpu_serve_decode_bench.py [audio|video] ...
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")

LATENTS_PER_SECOND = 60.0


def bench_audio():
    from owl_audio_exps_tpu.configs import transformer_config
    from owl_audio_exps_tpu.models.audiorft import AudioRFTCore
    from owl_audio_exps_tpu.sampling.audio_caching import AudioCachingSampler
    from owl_audio_exps_tpu.nn.audio_vae import AudioVAE

    cfg = transformer_config(
        model_id="audio_rft", sample_size=120, channels=64,
        n_layers=16, n_heads=16, d_model=1024,
        tokens_per_frame=1, n_frames=4096,
        cfg_prob=0.0, causal=True, uncond=True, backbone="dit",
        has_audio=True, rope_impl="audio1d",
        local_window=16, global_window=None)
    core = AudioRFTCore(cfg, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    init_len, num_tokens = 120, 240
    x = jnp.asarray(rs.randn(1, init_len, 64), jnp.bfloat16)
    t0 = jnp.zeros((1, init_len), jnp.bfloat16)
    params = core.init(jax.random.key(0), x, t0)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    sampler = AudioCachingSampler(
        n_steps=2, num_tokens=num_tokens, noise_prev=0.2,
        custom_schedule=[1.0, 0.5], max_window=120)

    vae = AudioVAE()
    zs = jnp.zeros((1, 120, 64), jnp.bfloat16)
    vparams = vae.init(jax.random.key(1), method=vae.decode, z=zs)
    vparams = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        vparams)
    # params as jit arguments — closure literals bloat the relay upload
    _dec = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode))
    dec = lambda z: _dec(vparams, z)

    # warmup all programs; the sampler returns [ctx | generated] — the
    # decode rows cover the GENERATED 240 tokens
    lat = sampler(core, params, x, jax.random.key(2))
    np.asarray(lat)
    gen = lat[:, init_len:]
    np.asarray(dec(gen[:, :120].astype(jnp.bfloat16)))
    np.asarray(dec(gen.reshape(2, 120, 64).astype(jnp.bfloat16)))

    lat_t, dec_t, decb_t, e2e_t = [], [], [], []
    for i in range(3):
        t_start = time.perf_counter()
        lat = sampler(core, params, x, jax.random.key(3 + i))
        np.asarray(lat)
        t_mid = time.perf_counter()
        # streaming shape: one decode dispatch per 2 s window
        gen = lat[:, init_len:]
        wfs = [dec(gen[:, s:s + 120].astype(jnp.bfloat16))
               for s in range(0, num_tokens, 120)]
        wf = np.concatenate([np.asarray(w) for w in wfs], axis=1)
        t_end = time.perf_counter()
        # batched: both windows in one dispatch (chip cost sans the
        # per-window relay round trip)
        np.asarray(dec(gen.reshape(2, 120, 64).astype(jnp.bfloat16)))
        t_b = time.perf_counter()
        lat_t.append(t_mid - t_start)
        dec_t.append(t_end - t_mid)
        decb_t.append(t_b - t_end)
        e2e_t.append(t_end - t_start)
    lat_w, dec_w, e2e_w = (float(np.median(t))
                           for t in (lat_t, dec_t, e2e_t))
    decb_w = float(np.median(decb_t))
    secs = num_tokens / LATENTS_PER_SECOND
    print(f"audio: {num_tokens} tokens = {secs:.1f} s audio; "
          f"wf out {wf.shape}")
    print(f"  latent-only  {lat_w*1e3:8.1f} ms  RTF {secs/lat_w:6.2f}")
    print(f"  decode       {dec_w*1e3:8.1f} ms  "
          f"({dec_w/e2e_w*100:.1f}% of e2e; "
          f"{dec_w/(num_tokens/120):.4f} s per 2s-window)")
    print(f"  decode/batch {decb_w*1e3:8.1f} ms  (one dispatch)")
    print(f"  end-to-end   {e2e_w*1e3:8.1f} ms  RTF incl. decode "
          f"{secs/e2e_w:6.2f}  (batched-decode RTF "
          f"{secs/(lat_w+decb_w):6.2f})")


def bench_video():
    from owl_audio_exps_tpu.configs import transformer_config
    from owl_audio_exps_tpu.models.gamerft import GameRFTCore
    from owl_audio_exps_tpu.sampling.av_caching import AVCachingSamplerV2
    from owl_audio_exps_tpu.utils.owl_vae_bridge import DCAEVideoDecoder

    CAP, N_GEN, STEPS = 120, 16, 2
    cfg = transformer_config(
        model_id="game_rft", sample_size=8, channels=128, n_layers=16,
        n_heads=24, d_model=1536, tokens_per_frame=64, n_buttons=11,
        cfg_prob=0.0, n_frames=256, causal=True,
        uncond=False, backbone="dit", has_audio=False, rope_impl="motion",
        local_window=16, global_window=None)
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
    sampler = AVCachingSamplerV2(
        n_steps=STEPS, cfg_scale=1.0, num_frames=N_GEN, noise_prev=0.2,
        max_window=CAP, custom_schedule=[1.0, 0.5])

    decoder = DCAEVideoDecoder(latent_channels=128)

    out = sampler(core, params, x, mouse, btn, jax.random.key(1))
    np.asarray(out)
    # the sampler returns [ctx | generated]: decode the GENERATED frames
    np.asarray(decoder(out[:, init_len]))
    np.asarray(decoder(out[0, init_len:init_len + N_GEN]))  # batched too

    lat_t, dec_t, decb_t = [], [], []
    for i in range(3):
        t_start = time.perf_counter()
        out = sampler(core, params, x, mouse, btn, jax.random.key(2 + i))
        np.asarray(out)
        t_mid = time.perf_counter()
        # per-tick eager decode: one dispatch + frame fetch per frame —
        # the interactive-loop shape; through the relay this is
        # dispatch-bound (PERF.md gotcha 3), on-node it is not
        frames = [np.asarray(decoder(out[:, init_len + f]))
                  for f in range(N_GEN)]
        t_end = time.perf_counter()
        # batched decode of the same frames: one dispatch — the chip
        # compute cost without the per-tick relay round trips
        np.asarray(decoder(out[0, init_len:init_len + N_GEN]))
        t_b = time.perf_counter()
        lat_t.append(t_mid - t_start)
        dec_t.append(t_end - t_mid)
        decb_t.append(t_b - t_end)
    lat_w, dec_w = float(np.median(lat_t)), float(np.median(dec_t))
    decb_w = float(np.median(decb_t))
    e2e = lat_w + dec_w
    e2e_b = lat_w + decb_w
    print(f"video: dit_v4 0.45B cap={CAP} steps={STEPS} gen={N_GEN}; "
          f"frame out {frames[0].shape}")
    print(f"  latent-only  {lat_w/N_GEN*1e3:8.2f} ms/frame "
          f"({N_GEN/lat_w:6.1f} f/s)")
    print(f"  decode/tick  {dec_w/N_GEN*1e3:8.2f} ms/frame "
          f"({dec_w/e2e*100:.1f}% of e2e; per-frame dispatch)")
    print(f"  decode/batch {decb_w/N_GEN*1e3:8.2f} ms/frame "
          f"(one dispatch for {N_GEN} frames)")
    print(f"  e2e per-tick {e2e/N_GEN*1e3:8.2f} ms/frame "
          f"({N_GEN/e2e:6.1f} f/s incl. decode; budget 16.7 ms)")
    print(f"  e2e batched  {e2e_b/N_GEN*1e3:8.2f} ms/frame "
          f"({N_GEN/e2e_b:6.1f} f/s incl. decode)")


if __name__ == "__main__":
    which = sys.argv[1:] or ["audio", "video"]
    if "audio" in which:
        bench_audio()
    if "video" in which:
        bench_video()
