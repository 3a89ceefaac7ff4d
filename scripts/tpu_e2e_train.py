"""End-to-end Trainer verification ON THE CHIP (not just the raw step):
config -> data -> jitted grad-accum step -> metrics -> media export ->
orbax checkpoint -> resume. Uses configs/dit_v4_tpu_e2e.yml (real
dit_v4 scale, synthetic latents).

Run: python scripts/tpu_e2e_train.py
Prints one PASS line per phase; exits nonzero on any failure.
"""
import sys, pathlib, os, shutil, glob

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")
from owl_audio_exps_tpu.configs import Config
from owl_audio_exps_tpu.trainers import get_trainer_cls

CFG = str(pathlib.Path(__file__).resolve().parents[1]
          / "configs" / "dit_v4_tpu_e2e.yml")

for d in ("/tmp/owl_e2e_ckpt", "/tmp/owl_e2e_export"):
    shutil.rmtree(d, ignore_errors=True)

# ---- phase 1: fresh 12-step run (checkpoints at step 6 and 12) -------
cfg = Config.from_yaml(CFG)
trainer = get_trainer_cls(cfg.train.trainer_id)(cfg)
state = trainer.train(max_steps=12)
assert int(state.step) == 12, f"step counter {int(state.step)} != 12"
for leaf in jax.tree.leaves(state.params):
    assert np.isfinite(np.asarray(leaf)).all(), "non-finite params"
print("PASS fresh-run  12 steps, params finite", flush=True)

ckpts = sorted(glob.glob("/tmp/owl_e2e_ckpt/step_*"))
assert any(p.endswith("step_12") for p in ckpts), f"missing final ckpt: {ckpts}"
print(f"PASS checkpoint {[os.path.basename(p) for p in ckpts]}", flush=True)

# phase 1's state (params + EMA + opt) must leave the chip before the
# resume loads its own copy — two full dit_v4 states don't co-reside
import gc
del state, trainer
gc.collect()

# ---- phase 2: resume from step 12, train 4 more --------------------
cfg2 = Config.from_yaml(CFG)
cfg2.train.resume_ckpt = "/tmp/owl_e2e_ckpt/step_12"
trainer2 = get_trainer_cls(cfg2.train.trainer_id)(cfg2)
state2 = trainer2.train(max_steps=16)
step = int(state2.step)
assert step == 16, f"resume did not continue the step counter: {step}"
for leaf in jax.tree.leaves(state2.params):
    assert np.isfinite(np.asarray(leaf)).all(), "non-finite resumed params"
print(f"PASS resume     step 12 -> {step}, params finite", flush=True)

print("PASS e2e")
