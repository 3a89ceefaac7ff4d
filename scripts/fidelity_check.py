"""Sample-fidelity harness: run a deterministic denoise trajectory with
weights imported from a torch reference checkpoint and compare against (or
produce) a golden output file.

Usage:
  # produce golden outputs from a reference checkpoint
  python scripts/fidelity_check.py --config configs/dit_v4.yml \
      --torch_ckpt ref.pt --write golden.npz
  # compare against stored goldens
  python scripts/fidelity_check.py --config configs/dit_v4.yml \
      --torch_ckpt ref.pt --compare golden.npz --tol 5e-2

The trajectory is fully deterministic: fixed seed noise, fixed controls,
SD3-Euler schedule — matching the reference sampler math
(owl_wms/sampling/av_caching_v2.py) so outputs from the torch reference
under the same seed protocol are comparable within bf16 tolerance.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--torch_ckpt", default=None)
    ap.add_argument("--write", default=None)
    ap.add_argument("--compare", default=None)
    ap.add_argument("--tol", type=float, default=5e-2)
    ap.add_argument("--n_steps", type=int, default=4)
    ap.add_argument("--n_frames", type=int, default=4)
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu); the environment "
                         "pins the TPU plugin otherwise")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from owl_audio_exps_tpu.configs import Config
    from owl_audio_exps_tpu.models import get_core_cls
    from owl_audio_exps_tpu.sampling.schedulers import get_sd3_euler
    from owl_audio_exps_tpu.utils.torch_import import (load_torch_file,
                                                       import_torch_state_dict)

    cfg = Config.from_yaml(args.config)
    m = cfg.model
    core = get_core_cls(m.model_id)(m)

    rs = np.random.RandomState(1234)
    n = args.n_frames
    if m.model_id == "audio_rft":
        x = jnp.asarray(rs.randn(1, n, m.channels), jnp.bfloat16)
        t = jnp.asarray(np.full((1, n), 1.0), jnp.bfloat16)
        extra = ()
    else:
        x = jnp.asarray(
            rs.randn(1, n, m.channels, m.sample_size, m.sample_size),
            jnp.bfloat16)
        t = jnp.asarray(np.full((1, n), 1.0), jnp.bfloat16)
        mouse = jnp.asarray(rs.randn(1, n, m.get("n_mouse_axes", 2)),
                            jnp.bfloat16)
        btn = jnp.asarray(rs.rand(1, n, m.n_buttons) > 0.5, jnp.bfloat16)
        extra = (mouse, btn)

    if args.torch_ckpt:
        sd = load_torch_file(args.torch_ckpt)
        params = import_torch_state_dict(sd, m.n_heads)
        if "core" in params:
            params = params["core"]
        params = jax.tree.map(jnp.asarray, params)
    else:
        params = core.init(jax.random.key(0), x, t, *extra)["params"]

    # deterministic Euler trajectory, per-step velocities recorded
    dt = get_sd3_euler(args.n_steps)
    outs = []
    cur, ct = x, t

    @jax.jit
    def fwd(cur, ct):
        pred, _ = core.apply({"params": params}, cur, ct, *extra)
        return pred

    for i in range(args.n_steps):
        pred = fwd(cur, ct)
        outs.append(np.asarray(pred, dtype=np.float32))
        cur = (cur.astype(jnp.float32)
               - float(dt[i]) * pred.astype(jnp.float32)).astype(cur.dtype)
        ct = (ct.astype(jnp.float32) - float(dt[i])).astype(ct.dtype)

    final = np.asarray(cur, dtype=np.float32)

    if args.write:
        np.savez(args.write, final=final,
                 **{f"v{i}": o for i, o in enumerate(outs)})
        print(f"wrote goldens to {args.write}")
    if args.compare:
        gold = np.load(args.compare)
        diff = np.abs(final - gold["final"]).max()
        print(f"final max|diff| = {diff:.5f} (tol {args.tol})")
        for i in range(args.n_steps):
            d = np.abs(outs[i] - gold[f"v{i}"]).max()
            print(f"  step {i} velocity max|diff| = {d:.5f}")
        assert diff < args.tol, "fidelity check FAILED"
        print("fidelity check PASSED")


if __name__ == "__main__":
    main()
