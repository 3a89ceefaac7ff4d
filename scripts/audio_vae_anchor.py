"""Audio-VAE quality anchor: full pipeline artifact (train -> encode ->
RFT-train -> sample -> decode -> wav).

VERDICT r3 item 9: demonstrate the audio capability end-to-end, not
just type-correct. This script:

1. trains the in-repo AudioVAE (nn/audio_vae.py) on synthetic tone
   mixtures (data/synthetic.py `synthetic_tones` — learnable material,
   unlike white noise) and records the reconstruction STFT/L1 losses;
2. encodes tones to latents with the trained encoder and trains a small
   AudioRFT on them;
3. samples a continuation with AudioCachingSampler and decodes it
   through the trained decoder;
4. writes runs/audio_vae_anchor/{metrics.json, recon.wav, sample.wav}.

The reference cannot do any of this in-repo: its VAEs live in the
un-vendored owl-vaes submodule (SURVEY.md intro) and are consumed as
checkpoints (owl_wms/utils/owl_vae_bridge.py:104-120).

Usage: python scripts/audio_vae_anchor.py [vae_steps] [rft_steps]
"""
import sys, pathlib, os, json, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")

from owl_audio_exps_tpu.configs import Config, transformer_config
from owl_audio_exps_tpu.data.synthetic import get_loader
from owl_audio_exps_tpu.trainers import get_trainer_cls
from owl_audio_exps_tpu.trainers.audio_vae_trainer import multires_stft_loss
from owl_audio_exps_tpu.utils.media import write_wav

VAE_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 800
RFT_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 400
N_SAMPLES = 735 * 32            # 32 latents per window
OUT = pathlib.Path(__file__).resolve().parents[1] / "runs" / \
    "audio_vae_anchor"


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    t0 = time.time()

    # ---- 1. train the VAE on tones
    cfg = Config.from_dict({
        "model": {"model_id": "audio_vae", "channels": 64},
        "train": {
            "trainer_id": "audio_vae",
            "data_id": "synthetic_tones",
            "data_kwargs": {"n_samples": N_SAMPLES},
            "batch_size": 8, "target_batch_size": 8,
            "opt_kwargs": {"lr": 3e-4},
            "checkpoint_dir": str(OUT / "vae_ckpt"),
            "save_interval": 10 ** 9, "sample_interval": 10 ** 9,
            "log_interval": 100,
        },
        "wandb": {"run_name": "audio_vae_anchor"},
    })
    trainer = get_trainer_cls("audio_vae")(cfg)
    wf_eval = jnp.asarray(
        next(iter(get_loader("synthetic_tones", 4, n_samples=N_SAMPLES,
                             process_index=7)))[0], jnp.bfloat16)
    init_p = trainer.vae.init(jax.random.key(0), wf_eval)["params"]

    def recon_metrics(params):
        recon, z = trainer.vae.apply({"params": params}, wf_eval)
        return (recon,
                float(jnp.mean(jnp.abs(
                    recon - wf_eval.astype(jnp.float32)))),
                float(multires_stft_loss(recon, wf_eval)), z)

    _, l1_0, stft_0, _ = recon_metrics(init_p)
    state = trainer.train(max_steps=VAE_STEPS)
    recon, l1_t, stft_t, z_eval = recon_metrics(state.params)
    print(f"VAE {VAE_STEPS} steps: l1 {l1_0:.4f}->{l1_t:.4f}, "
          f"stft {stft_0:.3f}->{stft_t:.3f} "
          f"(latent rms {float(jnp.sqrt(jnp.mean(z_eval**2))):.3f})")
    write_wav(str(OUT / "recon.wav"),
              np.asarray(recon[0], np.float32), 44100)

    vae, vae_params = trainer.vae, state.params
    enc = jax.jit(lambda wf: vae.apply({"params": vae_params}, wf,
                                       method=vae.encode))
    dec = jax.jit(lambda z: vae.apply({"params": vae_params}, z,
                                      method=vae.decode))

    # ---- 2. train a small AudioRFT on encoded tone latents
    from owl_audio_exps_tpu.models.audiorft import (AudioRFT,
                                                     AudioRFTCore)
    mcfg = transformer_config(
        model_id="audio_rft", sample_size=32, channels=64,
        n_layers=4, n_heads=4, d_model=256, tokens_per_frame=1,
        n_frames=256, cfg_prob=0.0, causal=True, uncond=True,
        backbone="dit", has_audio=True, rope_impl="audio1d",
        local_window=8, global_window=None)
    model = AudioRFT(mcfg, dtype=jnp.bfloat16)
    loader = iter(get_loader("synthetic_tones", 8, n_samples=N_SAMPLES))

    def next_latents():
        wf = jnp.asarray(next(loader)[0], jnp.bfloat16)
        return enc(wf).astype(jnp.bfloat16)

    z0 = next_latents()
    import optax
    params = model.init({"params": jax.random.key(1),
                         "noise": jax.random.key(2)}, z0)["params"]
    tx = optax.adamw(3e-4)
    opt = tx.init(params)

    @jax.jit
    def rft_step(params, opt, z, key):
        def loss_fn(p):
            return model.apply({"params": p}, z,
                               rngs={"noise": key})
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    key = jax.random.key(3)
    loss = None
    for i in range(RFT_STEPS):
        key, k = jax.random.split(key)
        params, opt, loss = rft_step(params, opt, next_latents(), k)
        if (i + 1) % 100 == 0:
            print(f"RFT step {i+1}: loss {float(loss):.4f}")

    # ---- 3. sample a continuation and decode it
    from owl_audio_exps_tpu.sampling.audio_caching import AudioCachingSampler
    core_mod = AudioRFTCore(mcfg, dtype=jnp.bfloat16)
    sampler = AudioCachingSampler(n_steps=8, num_tokens=32,
                                  noise_prev=0.2, max_window=32)
    ctx = enc(wf_eval[:1]).astype(jnp.bfloat16)
    out = sampler(core_mod, {"params": params["core"]}, ctx,
                  jax.random.key(9))
    wav = dec(out[:, -32:].astype(jnp.bfloat16))
    write_wav(str(OUT / "sample.wav"), np.asarray(wav[0], np.float32),
              44100)

    metrics = {
        "vae_steps": VAE_STEPS, "rft_steps": RFT_STEPS,
        "l1_init": l1_0, "l1_final": l1_t,
        "stft_init": stft_0, "stft_final": stft_t,
        "rft_final_loss": float(loss),
        "wall_seconds": time.time() - t0,
    }
    (OUT / "metrics.json").write_text(json.dumps(metrics, indent=2))
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
