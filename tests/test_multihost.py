"""REAL multi-process (multi-host) training verification.

The reference's distributed story is torchrun: N processes, NCCL
process group, DDP gradient sync (owl_wms/utils/ddp.py:5-28,
rft_trainer.py:95-96). The analogue here is ``jax.distributed`` — and
unlike the single-process virtual mesh the rest of the suite uses, this
test actually spawns TWO processes (4 virtual CPU devices each, gloo
cross-process collectives), initializes them into one 8-device global
mesh via ``parallel.dist.init_distributed``, and runs the real trainer:
per-process data shards assembled into global batches
(``jax.make_array_from_process_local_data``), a {data:4, fsdp:2} sharded
train step, and a cross-process equality check on the resulting params.

This catches the bugs a single-process mesh cannot: per-process rng
split-brain on replicated jit arguments, local-vs-global batch
placement, and collective deadlocks.
"""

import json
import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPROC = 2
DEVICES_PER_PROC = 4


def _child(process_id: int, nproc: int, port: int, out_path: str,
           mode: str = "dp_fsdp"):
    # platform pinning happened via the env the parent passed; jax must
    # not have been imported yet in this interpreter
    assert "jax" not in sys.modules
    sys.path.insert(0, REPO)
    from owl_audio_exps_tpu.parallel.dist import init_distributed

    pidx, local_devices, pcount = init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=process_id)

    import jax
    import jax.numpy as jnp

    assert pcount == nproc, f"process_count {pcount} != {nproc}"
    assert pidx == process_id
    assert len(local_devices) == DEVICES_PER_PROC
    assert jax.device_count() == nproc * DEVICES_PER_PROC

    from owl_audio_exps_tpu.configs import Config
    from owl_audio_exps_tpu.trainers import get_trainer_cls

    cfg = Config.from_dict({
        "model": {
            "model_id": "audio_rft", "n_layers": 2, "n_heads": 2,
            "d_model": 32, "channels": 8, "tokens_per_frame": 1,
            "n_frames": 16, "sample_size": 8, "causal": True,
            "uncond": True, "has_audio": True, "rope_impl": "audio1d",
            "local_window": 4, "global_window": None, "cfg_prob": 0.0,
            "backbone": "dit",
        },
        "train": {
            "trainer_id": "audio_rft",
            "data_id": "synthetic_audio_latent",
            "data_kwargs": {"window_length": 8, "channels": 8},
            # batch_size is the PER-PROCESS batch (reference semantics:
            # per-rank); global batch 8 shards over data*fsdp = 8
            "target_batch_size": 16, "batch_size": 4,
            "mesh": {"data": 4, "fsdp": 2},
            "log_interval": 1,
            # Muon: the reference's optimizer, whose rank-sharded NS5
            # (owl_wms/muon.py:95-115) maps to fsdp param sharding here —
            # this mode proves it trains across real processes
            "epochs": 1, "opt": "Muon",
            "opt_kwargs": {"lr": 1e-3, "momentum": 0.95,
                           "adamw_lr": 1e-3,
                           "adamw_keys": ["t_embed", "proj_in",
                                          "proj_out", "adaln", "gate"]},
            "scheduler": None,
            "sample_interval": 10 ** 9, "save_interval": 10 ** 9,
            "vae_scale": 1.0,
        },
        "wandb": {"run_name": "multihost_test", "project": None},
    })
    if mode == "seq":
        # context parallelism across the global mesh: data axis spans
        # the two processes, seq shards the frame axis within each
        cfg.model.sequence_parallel = True
        cfg.train.mesh = {"data": 2, "fsdp": 1, "tensor": 2, "seq": 2}
        cfg.train.batch_size = 2
        cfg.train.target_batch_size = 8
        cfg.train.opt = "AdamW"
        cfg.train.opt_kwargs = {"lr": 1e-3}
    elif mode == "pipe":
        # GPipe across the global mesh: data spans the processes, the
        # scan_layers group stack shards over pipe stages within each
        cfg.model.n_layers = 4
        cfg.model.local_idx = 2
        cfg.model.scan_layers = True
        cfg.model.pipeline_parallel = True
        cfg.model.pipeline_microbatches = 2
        cfg.train.mesh = {"data": 4, "pipe": 2}
        cfg.train.batch_size = 4
        cfg.train.target_batch_size = 16
        cfg.train.opt = "AdamW"
        cfg.train.opt_kwargs = {"lr": 1e-3}

    trainer = get_trainer_cls("audio_rft")(cfg)
    assert trainer.accum_steps() == 2  # target // per-process bs // nproc
    state = trainer.train(max_steps=2)
    assert int(state.step) == 2

    leaves = jax.tree.leaves(state.params)
    # params live on the GLOBAL mesh: every leaf spans both processes
    assert all(len(l.sharding.device_set) == nproc * DEVICES_PER_PROC
               for l in leaves)
    assert not any(l.is_fully_addressable for l in leaves)
    # and fsdp actually shards something (strict shard < global shape)
    n_strict = sum(1 for l in leaves
                   if l.addressable_shards[0].data.shape != l.shape)
    assert n_strict > 0, "no param leaf strictly sharded (fsdp/tensor)"

    def pnorm(params):
        return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                            for l in jax.tree.leaves(params)))

    norm = float(jax.jit(pnorm)(state.params))
    assert jnp.isfinite(norm)

    # SPMD consistency: every process must hold the identical model
    from jax.experimental import multihost_utils
    norms = multihost_utils.process_allgather(jnp.float32(norm))
    assert norms.shape == (nproc,)
    assert float(norms.max() - norms.min()) == 0.0, norms

    if mode in ("seq", "pipe"):
        with open(out_path, "w") as f:
            json.dump({"process": process_id, "param_norm": norm,
                       "step": int(state.step)}, f)
        print(f"CHILD_OK process={process_id} norm={norm}", flush=True)
        return

    # eval-batch broadcast: every process must see process 0's batch
    import numpy as _np
    local_batch = [_np.full((2, 3), process_id, _np.float32)]
    got = trainer.broadcast_eval_batch(local_batch)
    assert float(_np.asarray(got[0]).max()) == 0.0, "not process 0's batch"

    # multi-host checkpoint roundtrip: all processes participate in the
    # orbax save of the SHARDED state, then restore onto live shardings
    ckpt_dir = os.path.join(os.path.dirname(out_path), "mh_ckpt")
    trainer.train_cfg.checkpoint_dir = ckpt_dir
    trainer.save(state)
    from owl_audio_exps_tpu.utils.checkpoints import wait_for_checkpoints
    wait_for_checkpoints()
    trainer.barrier()
    restored = trainer.load(trainer.ckpt_path(int(state.step)), state)
    assert int(restored.step) == 2
    rnorm = float(jax.jit(pnorm)(restored.params))
    assert rnorm == norm, (rnorm, norm)
    # restored leaves keep the live (mesh-spanning) shardings
    rleaves = jax.tree.leaves(restored.params)
    assert all(len(l.sharding.device_set) == nproc * DEVICES_PER_PROC
               for l in rleaves)

    with open(out_path, "w") as f:
        json.dump({"process": process_id, "param_norm": norm,
                   "step": int(state.step)}, f)
    print(f"CHILD_OK process={process_id} norm={norm}", flush=True)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["dp_fsdp", "seq", "pipe"])
def test_two_process_sharded_training(tmp_path, mode):
    # gloo's rendezvous has a fixed ~30s connect deadline; on a
    # CPU-saturated host (parallel compile jobs) the children can miss
    # it — that's environment load, not a product failure, so retry once
    for attempt in range(2):
        ok, detail = _run_pair(tmp_path, mode)
        if ok:
            return
        transient = ("DEADLINE_EXCEEDED" in detail or "Gloo" in detail
                     or "initialization timed out" in detail)
        if not (transient and attempt == 0):
            raise AssertionError(detail)


def _run_pair(tmp_path, mode):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        flags +
        f" --xla_force_host_platform_device_count={DEVICES_PER_PROC}"
    ).strip()
    # the axon TPU plugin must not register in the children
    for k in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
              "AXON_LOOPBACK_RELAY"):
        env.pop(k, None)

    outs = [str(tmp_path / f"proc{i}.json") for i in range(NPROC)]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--child", str(i), str(NPROC), str(port), outs[i], mode],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(NPROC)
    ]
    logs, rcs = [], []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        logs.append(out)
        rcs.append(p.returncode)
    for i, (rc, log) in enumerate(zip(rcs, logs)):
        if rc != 0 or "CHILD_OK" not in log:
            return False, (f"child {i} rc={rc}\n--- child {i} log ---\n"
                           f"{log[-4000:]}")

    results = [json.load(open(o)) for o in outs]
    # both processes ended with the identical model
    if results[0]["param_norm"] != results[1]["param_norm"]:
        return False, f"param_norm mismatch: {results}"
    if not all(r["step"] == 2 for r in results):
        return False, f"bad step counts: {results}"
    return True, ""


if __name__ == "__main__" and "--child" in sys.argv:
    i = sys.argv.index("--child")
    _child(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
           int(sys.argv[i + 3]), sys.argv[i + 4], sys.argv[i + 5])
