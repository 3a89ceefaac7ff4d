"""98k-token fit probe via per-compile XLA compiler options.

docs/LONGCTX.md runs H/I showed XLA_FLAGS is client-rejected for
libtpu-only flags and LIBTPU_INIT_ARGS is not forwarded — but the relay
DOES forward proto-backed xla_* options per compile (its own flag-diff
error message says "proto-backed xla_* flags are forwarded per-compile").
JAX exposes that channel as ``.lower(...).compile(compiler_options=...)``.
This script compiles the full 1536-frame dit_v4 train step (the
reference's configs/dit_v4.yml geometry) under candidate scheduler /
memory options and prints each variant's program memory analysis.

Usage: python scripts/tpu_longctx_flags.py [n_frames] [opt-set index...]
"""
import sys, pathlib, os, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
from functools import partial
import jax, jax.numpy as jnp, optax
from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.gamerft import GameRFT
from owl_audio_exps_tpu.muon import init_muon

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
B = 1

# Candidate option sets, cheapest-win first. Values are strings (the
# compiler-options env wants text protos).
OPTION_SETS = [
    ("baseline", {}),
    ("lhs_off", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ("lhs_rerun5", {"xla_latency_hiding_scheduler_rerun": "5"}),
    ("sched_mem90", {"xla_tpu_scheduler_percent_shared_memory_limit": "90"}),
    ("sched_mem80", {"xla_tpu_scheduler_percent_shared_memory_limit": "80"}),
    ("lhs_off+mem80", {"xla_tpu_enable_latency_hiding_scheduler": "false",
                       "xla_tpu_scheduler_percent_shared_memory_limit": "80"}),
]
if len(sys.argv) > 2:
    keep = {int(a) for a in sys.argv[2:]}
    OPTION_SETS = [s for i, s in enumerate(OPTION_SETS) if i in keep]

cfg = transformer_config(
    model_id="game_rft", sample_size=8, channels=128, n_layers=16,
    n_heads=24, d_model=1536, tokens_per_frame=64, n_buttons=11,
    cfg_prob=0.1, n_frames=max(N_FRAMES, 256), causal=True, uncond=False,
    backbone="dit", has_audio=False, rope_impl="motion",
    local_window=16, global_window=None, gradient_checkpointing=True,
    remat_granularity="group", splash_head_chunks=4, mlp_chunks=8,
    scan_layers=True)
model = GameRFT(cfg, dtype=jnp.bfloat16)
rs = np.random.RandomState(0)
x = jnp.asarray(rs.randn(B, N_FRAMES, 128, 8, 8), jnp.bfloat16)
mouse = jnp.asarray(rs.randn(B, N_FRAMES, 2), jnp.bfloat16)
btn = jnp.asarray(rs.rand(B, N_FRAMES, 11) > 0.5, jnp.bfloat16)

# shapes only — no f32 tree on device
tree = jax.eval_shape(
    lambda k: model.init({"params": k, "noise": jax.random.key(1)},
                         x, mouse, btn)["params"], jax.random.key(0))
leaves, treedef = jax.tree.flatten(tree)
fill = jax.jit(lambda k, i: (0.02 * jax.random.normal(
    jax.random.fold_in(k, i), leaves[i].shape)).astype(leaves[i].dtype),
    static_argnums=1)
params = jax.tree.unflatten(
    treedef, [fill(jax.random.key(0), i) for i in range(len(leaves))])
tx = init_muon(params, lr=1e-4, momentum=0.95, adamw_lr=1e-4,
               adamw_keys=["t_embed", "control_embed", "proj_in",
                           "proj_out", "adaln", "gate"],
               momentum_dtype=jnp.bfloat16)
opt = tx.init(params)

def loss_fn(p, rng):
    return model.apply({"params": p}, x, mouse, btn, rngs={"noise": rng})

def step(p, o, rng):
    loss, g = jax.value_and_grad(loss_fn)(p, rng)
    g = jax.tree.map(lambda a: a.astype(jnp.bfloat16), g)
    up, o = tx.update(g, o, p)
    return optax.apply_updates(p, up), o, loss

lowered = jax.jit(step, donate_argnums=(0, 1)).lower(
    params, opt, jax.random.key(2))
GB = 1 << 30
for name, opts in OPTION_SETS:
    t0 = time.perf_counter()
    try:
        compiled = lowered.compile(compiler_options=opts or None)
        ma = compiled.memory_analysis()
        tot = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
               + ma.output_size_in_bytes - ma.alias_size_in_bytes)
        print("%-16s temp=%.2fG args=%.2fG out=%.2fG alias=%.2fG "
              "TOTAL=%.2fG  (%.0fs)" % (
                  name, ma.temp_size_in_bytes / GB,
                  ma.argument_size_in_bytes / GB,
                  ma.output_size_in_bytes / GB, ma.alias_size_in_bytes / GB,
                  tot / GB, time.perf_counter() - t0), flush=True)
        if tot / GB < 15.0:
            print("  -> FITS; executing one step...", flush=True)
            p2, o2, loss = compiled(params, opt, jax.random.key(2))
            jax.block_until_ready(loss)
            t1 = time.perf_counter()
            p2, o2, loss = compiled(p2, o2, jax.random.key(3))
            jax.block_until_ready(loss)
            print("  -> step ok, loss=%.4f, %.3f s/step" % (
                float(loss), time.perf_counter() - t1), flush=True)
            break
    except Exception as e:  # noqa: BLE001 — probe script, print and move on
        import re as _re
        msg = str(e)
        used = _re.search(r"Used ([0-9.]+[MG]) of ([0-9.]+[MG]) hbm", msg)
        over = _re.search(r"Exceeded hbm capacity by ([0-9.]+[MG])", msg)
        if used:
            print("%-16s OOM (%.0fs): used %s of %s (over by %s)" % (
                name, time.perf_counter() - t0, used.group(1), used.group(2),
                over.group(1) if over else "?"), flush=True)
        else:
            print("%-16s FAILED (%.0fs): %s" % (
                name, time.perf_counter() - t0,
                (msg[:600] + " ...TAIL... " + msg[-1200:]).replace("\n", " ")),
                flush=True)
