"""Logger / checkpoint helper tests."""

import json
import os

import numpy as np

from owl_audio_exps_tpu.utils.logging import LogHelper, ExperimentLogger
from owl_audio_exps_tpu.utils.checkpoints import latest_step_dir


def test_loghelper_means():
    h = LogHelper()
    h.log("loss", 1.0)
    h.log("loss", 3.0)
    h.log_dict({"aux": 2.0})
    out = h.pop()
    assert out == {"loss": 2.0, "aux": 2.0}
    assert h.pop() == {}  # cleared


def test_jsonl_sink(tmp_path):
    logger = ExperimentLogger({"run_name": "t", "project": None},
                              run_dir=str(tmp_path))
    logger.log({"loss": 1.5}, step=3)
    logger.log_media("samples", [1, 2, 3], step=3)
    logger.finish()
    lines = open(tmp_path / "t.jsonl").read().strip().splitlines()
    rec = json.loads(lines[0])
    assert rec["step"] == 3 and rec["loss"] == 1.5
    assert os.path.exists(tmp_path / "samples_3.npy")


def test_latest_step_dir(tmp_path):
    assert latest_step_dir(str(tmp_path / "nope")) is None
    for s in (10, 2, 30):
        os.makedirs(tmp_path / f"step_{s}")
    os.makedirs(tmp_path / "other")
    assert latest_step_dir(str(tmp_path)).endswith("step_30")


def test_deferred_metrics_is_lazy():
    """The train loop must not block per step: append must not touch the
    values; only drain() converts (VERDICT.md Weak #8)."""
    from owl_audio_exps_tpu.utils.logging import DeferredMetrics

    class Lazy:
        calls = 0

        def __float__(self):
            Lazy.calls += 1
            return 1.0

    dm = DeferredMetrics()
    dm.append(1, {"a": Lazy()})
    dm.append(2, {"a": Lazy()})
    assert Lazy.calls == 0, "append converted eagerly (host sync per step)"
    out = dm.drain()
    assert Lazy.calls == 2
    assert [s for s, _ in out] == [1, 2]
    assert out[0][1]["a"] == 1.0
    assert len(dm) == 0


def test_watch_telemetry_end_to_end(tmp_path):
    """watch='full' emits per-module norms + value histograms through a
    real train step (the wandb.watch analogue, reference
    rft_trainer.py:155-156)."""
    import jax
    from test_trainer import audio_cfg_dict
    from owl_audio_exps_tpu.configs import Config
    from owl_audio_exps_tpu.trainers import get_trainer_cls

    d = audio_cfg_dict(tmp_path)
    d["train"]["watch"] = "full"
    d["train"]["watch_bins"] = 16
    d["train"]["log_interval"] = 1
    trainer = get_trainer_cls("audio_rft")(Config.from_dict(d))
    captured = []
    trainer.logger.log = lambda m, step=None: captured.append(m)
    trainer.train(max_steps=1)

    log = captured[-1]
    norm_keys = [k for k in log if k.startswith("watch/param_norm/")]
    grad_keys = [k for k in log if k.startswith("watch/grad_norm/")]
    assert norm_keys and grad_keys, f"no watch norms in {sorted(log)}"
    assert all(np.isfinite(log[k]) for k in norm_keys + grad_keys)
    hist = log["watch_hist/grads"]
    assert np.ndim(hist) == 1 and hist.sum() > 0
    n_params = sum(x.size for x in jax.tree.leaves(
        trainer.model.init({"params": jax.random.key(0),
                            "noise": jax.random.key(1)},
                           *trainer.batch_to_model_args(
                               trainer.example_batch()))["params"]))
    assert int(hist.sum()) == n_params, "histogram misses elements"
    assert float(log["watch_hist/grads_lo"]) <= \
        float(log["watch_hist/grads_hi"])
