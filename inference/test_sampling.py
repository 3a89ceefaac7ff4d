"""Offline sampling driver: load checkpoint -> stream frames -> decode.

Reference: inference/test_sampling.py:1-115 (from_pretrained ->
AVCachingSamplerV2 -> decode -> wandb). Here: loads (config, params),
runs the registered sampler on synthetic or cached context, reports
latency stats, optionally decodes and saves npz.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--ckpt_path", default=None)
    parser.add_argument("--num_frames", type=int, default=60)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from owl_audio_exps_tpu import from_pretrained
    from owl_audio_exps_tpu.models import get_core_cls
    from owl_audio_exps_tpu.sampling import get_sampler_cls

    cfg, params = from_pretrained(args.config_path, args.ckpt_path)
    m = cfg.model
    core = get_core_cls(m.model_id)(m)

    rs = np.random.RandomState(0)
    skw = dict((cfg.train.sampler_kwargs or {}).items())
    skw["num_frames"] = args.num_frames
    sampler = get_sampler_cls(cfg.train.sampler_id)(**skw)

    if m.model_id == "audio_rft":
        ctx = jnp.asarray(rs.randn(1, 16, m.channels), jnp.bfloat16)
        if params is None:
            params = core.init(jax.random.key(0), ctx,
                               jnp.zeros((1, 16), jnp.bfloat16))["params"]
        t0 = time.perf_counter()
        latents = sampler(core, {"params": params}, ctx, jax.random.key(1))
        np.asarray(latents)
        wall = time.perf_counter() - t0
    else:
        n_ctx = 8
        total = n_ctx + args.num_frames
        ctx = jnp.asarray(
            rs.randn(1, n_ctx, m.channels, m.sample_size, m.sample_size),
            jnp.bfloat16)
        mouse = jnp.asarray(rs.randn(1, total, 2), jnp.bfloat16)
        btn = jnp.asarray(rs.rand(1, total, m.n_buttons) > 0.5,
                          jnp.bfloat16)
        if params is None:
            params = core.init(
                jax.random.key(0), ctx, jnp.zeros((1, n_ctx), jnp.bfloat16),
                mouse[:, :n_ctx], btn[:, :n_ctx])["params"]
        t0 = time.perf_counter()
        latents = sampler(core, {"params": params}, ctx, mouse, btn,
                          jax.random.key(1))
        np.asarray(latents)
        wall = time.perf_counter() - t0

    print(f"sampled latents {tuple(latents.shape)} in {wall:.2f}s "
          f"({args.num_frames / wall:.2f} frames/s)")
    if args.out:
        np.save(args.out, np.asarray(latents, dtype=np.float32))


if __name__ == "__main__":
    main()
