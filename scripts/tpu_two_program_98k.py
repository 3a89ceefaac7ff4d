"""Two-program train step: the 98k single-chip program-structure attack.

docs/LONGCTX.md runs A-W established that every ONE-program variant of
the 98,304-token dit_v4 step pins at 16.0-17.2 GB program requirement
against 15.75 GB, with only 8.7 GB of live data — the latency-hiding
scheduler re-expands into every byte freed and its memory-budget flags
cannot be delivered through the axon relay. This script attacks the
PROGRAM STRUCTURE instead (VERDICT r3 item 4): split the step into two
jitted programs so the scheduler budgets each half separately.

  Program A (fwd): noise/targets from the key, prologue (embeddings +
    proj_in), a fwd-only lax.scan over the layer groups COLLECTING each
    group's input boundary ((G+1) x [B, L, d] bf16 — the same residuals
    group-remat would save), epilogue + loss.
  Program B (bwd+update): regenerates targets from the same key,
    re-runs prologue/epilogue under jax.vjp, then a REVERSE scan over
    groups: per group one jax.vjp of the group forward from its saved
    boundary (per-block remat inside bounds the working set), grads
    emitted directly into the stacked [G, ...] layout (scan_layers
    params — no cross-group accumulation), cond cotangents summed in
    the carry; Muon update, params/opt donated.

The prologue/epilogue modules replicate GameRFTCore's exact submodule
structure and names (models/gamerft.py:60-89), so they apply against
slices of the SAME param tree; a --check mode verifies loss and every
grad leaf against the standard one-program step at a fitting geometry.

Usage:
  python scripts/tpu_two_program_98k.py check [n_frames=256]
  python scripts/tpu_two_program_98k.py fit [n_frames=1536]
Env: OWL_MUON_BF16/OWL_GRADS_BF16/OWL_SPLASH_HEAD_CHUNKS/OWL_MLP_CHUNKS
as in scripts/tpu_train_bench.py (the recorded-row flags).
"""
import sys, pathlib, os, time
from functools import partial
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_tpu_cache")
import numpy as np
import jax, jax.numpy as jnp
import flax.linen as nn
jax.config.update("jax_compilation_cache_dir", "/root/jax_tpu_cache")

from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.models.gamerft import GameRFT
from owl_audio_exps_tpu.nn.attn import DiTGroup
from owl_audio_exps_tpu.nn.embeddings import (TimestepEmbedding,
                                              ControlEmbedding)
from owl_audio_exps_tpu.nn.layers import FinalLayer, Linear

MODE = sys.argv[1] if len(sys.argv) > 1 else "check"
N_FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else \
    (256 if MODE == "check" else 1536)
B = 1
BF16 = jnp.bfloat16


def build_cfg():
    return transformer_config(
        cfg_prob=0.0, n_frames=max(N_FRAMES, 256), causal=True,
        uncond=False, model_id="game_rft", backbone="dit",
        has_audio=False, rope_impl="motion", sample_size=8,
        channels=128, n_layers=16, n_heads=24, d_model=1536,
        tokens_per_frame=64, n_buttons=11, local_window=16,
        global_window=None, gradient_checkpointing=True,
        remat_granularity="group",
        splash_head_chunks=int(os.environ.get("OWL_SPLASH_HEAD_CHUNKS",
                                              "4")),
        mlp_chunks=int(os.environ.get("OWL_MLP_CHUNKS", "8")),
        scan_layers=True)


class Prologue(nn.Module):
    """models/gamerft.py:60-83 with identical submodule names."""
    config: object
    dtype: jnp.dtype = BF16

    @nn.compact
    def __call__(self, lerpd, ts, mouse, btn):
        cfg = self.config
        b, n, c, h, w = lerpd.shape
        t_cond = TimestepEmbedding(cfg.d_model, dtype=self.dtype,
                                   name="t_embed")(ts)
        ctrl = ControlEmbedding(cfg.n_buttons, cfg.d_model,
                                dtype=self.dtype,
                                name="control_embed")(mouse, btn)
        cond = t_cond + ctrl
        tokens = jnp.transpose(lerpd, (0, 1, 3, 4, 2)).reshape(
            b, n * h * w, c)
        h0 = Linear(cfg.d_model, use_bias=False, dtype=self.dtype,
                    name="proj_in")(tokens.astype(self.dtype))
        return h0, cond


def pro_params(p):
    return {k: p[k] for k in ("t_embed", "control_embed", "proj_in")}


def make_fns(cfg):
    prologue = Prologue(cfg)
    final = FinalLayer(cfg.d_model, cfg.channels, dtype=BF16)
    group = DiTGroup(cfg, dtype=BF16)
    # B-side group: sequenced remat serializes the per-block backward
    # (one block's working set at a time — nn/attn.py sequenced_block).
    # The one-program scan paid residual-stacking for this (LONGCTX run
    # L/U); here the boundaries are already external args, so only the
    # in-scan working set changes. OWL_TWO_PROG_SEQ=0 disables.
    cfg_b = cfg
    if os.environ.get("OWL_TWO_PROG_SEQ", "1") != "0":
        import copy
        cfg_b = copy.deepcopy(cfg)
        cfg_b.remat_sequenced = True
    group_b = DiTGroup(cfg_b, dtype=BF16)

    def noise(x, key):
        b, n = x.shape[:2]
        r_ts, r_z = jax.random.split(jax.random.fold_in(key, 7))
        ts = jax.nn.sigmoid(jax.random.normal(r_ts, (b, n), jnp.float32))
        z = jax.random.normal(r_z, x.shape, jnp.float32)
        xf = x.astype(jnp.float32)
        te = ts[:, :, None, None, None]
        lerpd = (xf * (1.0 - te) + z * te).astype(BF16)
        target = z - xf
        return ts.astype(BF16), lerpd, target

    def run_group(gp, h, c):
        out, _ = group.apply({"params": gp}, h, c, None, None, None,
                             True)
        return out

    def run_group_b(gp, h, c):
        out, _ = group_b.apply({"params": gp}, h, c, None, None, None,
                               True)
        return out

    def epilogue(po, h, c, target, shape):
        b, n, ch, hh, ww = shape
        tokens = final.apply({"params": po}, h, c)
        pred = tokens.reshape(b, n, hh, ww, ch).transpose(0, 1, 4, 2, 3)
        return jnp.mean(jnp.square(pred.astype(jnp.float32) - target))

    @jax.jit
    def prog_a(params, x, mouse, btn, key):
        ts, lerpd, target = noise(x, key)
        h0, cond = prologue.apply({"params": pro_params(params)},
                                  lerpd, ts, mouse, btn)

        def body(h, gp):
            return run_group(gp, h, cond), h

        hG, bounds = jax.lax.scan(body, h0,
                                  params["transformer"]["groups"])
        loss = epilogue(params["proj_out"], hG, cond, target, x.shape)
        return loss, bounds, hG, cond

    def prog_b_core(params, x, mouse, btn, key, bounds, hG):
        ts, lerpd, target = noise(x, key)
        # prologue under vjp (recompute is ~free: tiny inputs)
        (h0, cond), pro_vjp = jax.vjp(
            lambda pp: prologue.apply({"params": pp}, lerpd, ts,
                                      mouse, btn),
            pro_params(params))
        loss, epi_vjp = jax.vjp(
            lambda po, h, c: epilogue(po, h, c, target, x.shape),
            params["proj_out"], hG, cond)
        dpo, dh, dcond = epi_vjp(jnp.float32(1.0))

        grads_bf16 = os.environ.get("OWL_GRADS_BF16") == "1"

        def rev_body(carry, inp):
            dh, dcond_acc = carry
            h_in, gp = inp
            _, gvjp = jax.vjp(run_group_b, gp, h_in, cond)
            dgp, dh_in, dcond_g = gvjp(dh.astype(BF16))
            if grads_bf16:
                # cast INSIDE the scan: the stacked [G, ...] grad ys
                # materialize at half size (2.8 G -> 1.4 G at 0.7B)
                dgp = jax.tree.map(lambda g: g.astype(BF16), dgp)
            return (dh_in, dcond_acc + dcond_g), dgp

        (dh0, dcond_total), dgroups = jax.lax.scan(
            rev_body, (dh.astype(BF16), dcond.astype(BF16)),
            (bounds, params["transformer"]["groups"]), reverse=True)
        (dpro,) = pro_vjp((dh0, dcond_total))
        grads = dict(dpro)
        grads["transformer"] = {"groups": dgroups}
        grads["proj_out"] = dpo
        if grads_bf16:
            grads = jax.tree.map(lambda g: g.astype(BF16), grads)
        return loss, grads

    # ---- host-loop B (the fit-mode structure): one jitted program
    # per group backward — G small programs instead of one big reverse
    # scan, so the latency-hiding scheduler budgets each group alone
    # and consumed boundaries are freed between calls (python-side
    # refcount). Dispatch overhead: ~G x 5-20 ms per step, noise at
    # multi-second 98k steps.
    @jax.jit
    def prog_epi_bwd(po, hG, cond, x, key):
        _, _, target = noise(x, key)
        loss, epi_vjp = jax.vjp(
            lambda po, h, c: epilogue(po, h, c, target, x.shape),
            po, hG, cond)
        dpo, dh, dcond = epi_vjp(jnp.float32(1.0))
        return loss, dpo, dh.astype(BF16), dcond.astype(BF16)

    @partial(jax.jit, donate_argnums=(1, 3, 4, 5),
             static_argnums=(6,))
    def prog_group_bwd(gp, h_in, cond, dh, dcond_acc, dgroups, g):
        _, gvjp = jax.vjp(run_group_b, gp, h_in, cond)
        dgp, dh_in, dcond_g = gvjp(dh)
        # write this group's grads straight into the donated stacked
        # buffer — no per-group pieces list + eager stack (2x the
        # stacked bytes transient, the fit-killer at 98k)
        dgroups = jax.tree.map(
            lambda buf, piece: jax.lax.dynamic_update_index_in_dim(
                buf, piece.astype(buf.dtype), g, 0),
            dgroups, dgp)
        return dgroups, dh_in, dcond_acc + dcond_g

    @jax.jit
    def prog_pro_bwd(pp, x, mouse, btn, key, dh0, dcond):
        ts, lerpd, _ = noise(x, key)
        _, pro_vjp = jax.vjp(
            lambda pp: prologue.apply({"params": pp}, lerpd, ts,
                                      mouse, btn), pp)
        (dpro,) = pro_vjp((dh0, dcond))
        if os.environ.get("OWL_GRADS_BF16") == "1":
            dpro = jax.tree.map(lambda g: g.astype(BF16), dpro)
        return dpro

    def hostloop_b(params, x, mouse, btn, key, bounds, hG, cond):
        G = bounds.shape[0]
        loss, dpo, dh, dcond = prog_epi_bwd(params["proj_out"], hG,
                                            cond, x, key)
        groups = params["transformer"]["groups"]
        gdtype = BF16 if os.environ.get("OWL_GRADS_BF16") == "1" \
            else None
        dgroups = jax.tree.map(
            lambda a: jnp.zeros(a.shape, gdtype or a.dtype), groups)
        dbg = os.environ.get("OWL_TWO_PROG_DEBUG") == "1"
        sync = os.environ.get("OWL_TWO_PROG_SYNC", "1") != "0"
        for g in reversed(range(G)):
            gp = jax.tree.map(lambda a: a[g], groups)
            dgroups, dh, dcond = prog_group_bwd(
                gp, bounds[g], cond, dh, dcond, dgroups, g)
            del gp
            if sync:
                # hard sync each iteration: the relay defers buffer
                # frees under async dispatch — without this, donated /
                # dead buffers from the previous group linger and the
                # next eager slice OOMs (observed at 98k)
                np.asarray(dcond[0, 0, 0])
            if dbg:
                print(f"  group {g} done", flush=True)
        dpro = prog_pro_bwd(pro_params(params), x, mouse, btn, key,
                            dh, dcond)
        grads = dict(dpro)
        grads["transformer"] = {"groups": dgroups}
        grads["proj_out"] = dpo
        if os.environ.get("OWL_GRADS_BF16") == "1":
            grads = jax.tree.map(lambda g: g.astype(BF16), grads)
        return loss, grads

    return prog_a, prog_b_core, hostloop_b


def main():
    cfg = build_cfg()
    model = GameRFT(cfg, dtype=BF16)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, N_FRAMES, 128, 8, 8), BF16)
    mouse = jnp.asarray(rs.randn(B, N_FRAMES, 2), BF16)
    btn = jnp.asarray(rs.rand(B, N_FRAMES, 11) > 0.5, BF16)

    params = jax.jit(lambda k: model.init(
        {"params": k, "noise": jax.random.key(1)}, x, mouse, btn
    )["params"])(jax.random.key(0))
    core = params["core"]
    if os.environ.get("OWL_PARAMS_BF16") == "1":
        # bf16 master params: the 5B fit lever (tpu_train_bench.py);
        # halves the largest steady-state tenant in program B
        core = jax.tree.map(lambda a: a.astype(BF16), core)
        del params
    prog_a, prog_b_core, hostloop_b = make_fns(cfg)

    if MODE == "check":
        key = jax.random.key(2)
        loss_a, bounds, hG, cond = prog_a(core, x, mouse, btn, key)
        loss_b, grads = hostloop_b(core, x, mouse, btn, key, bounds,
                                   hG, cond)

        # the standard one-program step with the SAME noise draws:
        # replicate the model.apply noising inline (the wrapper draws
        # from the 'noise' rng stream; our fns fold key->7 — so compare
        # against a manual reference using the same noise fn)
        def ref_loss(p, key):
            from owl_audio_exps_tpu.models.gamerft import GameRFTCore
            coremod = GameRFTCore(cfg, dtype=BF16)
            b, n = x.shape[:2]
            r_ts, r_z = jax.random.split(jax.random.fold_in(key, 7))
            ts = jax.nn.sigmoid(jax.random.normal(r_ts, (b, n),
                                                  jnp.float32))
            z = jax.random.normal(r_z, x.shape, jnp.float32)
            xf = x.astype(jnp.float32)
            te = ts[:, :, None, None, None]
            lerpd = (xf * (1.0 - te) + z * te).astype(BF16)
            target = z - xf
            pred, _ = coremod.apply({"params": p}, lerpd,
                                    ts.astype(BF16), mouse, btn)
            return jnp.mean(jnp.square(pred.astype(jnp.float32)
                                       - target))

        loss_r, grads_r = jax.jit(jax.value_and_grad(ref_loss))(
            core, key)
        if os.environ.get("OWL_GRADS_BF16") == "1":
            grads_r = jax.tree.map(lambda g: g.astype(BF16), grads_r)
        print(f"loss two-prog A={float(loss_a):.6f} "
              f"B={float(loss_b):.6f} ref={float(loss_r):.6f}")
        flat, _ = jax.tree_util.tree_flatten_with_path(grads)
        flat_r = dict(jax.tree_util.tree_flatten_with_path(grads_r)[0])
        worst = 0.0
        for path, g in flat:
            r = flat_r[path]
            scale = max(1e-6, float(jnp.abs(r).max()))
            rel = float(jnp.abs(g.astype(jnp.float32)
                                - r.astype(jnp.float32)).max()) / scale
            worst = max(worst, rel)
            if rel > 2e-2:
                print("  MISMATCH", jax.tree_util.keystr(path), rel)
        print(f"grad leaves: {len(flat)}, worst rel diff {worst:.3e}")
        assert abs(float(loss_a) - float(loss_r)) < 1e-3
        print("CHECK OK" if worst < 2e-2 else "CHECK FAILED")
        return

    # fit/throughput mode
    from owl_audio_exps_tpu.muon import init_muon
    mom_dtype = BF16 if os.environ.get("OWL_MUON_BF16") == "1" else None
    tx = init_muon(core, lr=1e-4, momentum=0.95, adamw_lr=1e-4,
                   adamw_keys=["t_embed", "control_embed", "proj_in",
                               "proj_out", "adaln", "gate"],
                   momentum_dtype=mom_dtype)
    opt = tx.init(core)

    import optax

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def prog_update(params, opt, grads):
        up, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, up), opt

    def full_step(core, opt, key):
        loss, bounds, hG, cond = prog_a(core, x, mouse, btn, key)
        loss_b, grads = hostloop_b(core, x, mouse, btn, key, bounds,
                                   hG, cond)
        del bounds, hG
        core, opt = prog_update(core, opt, grads)
        return core, opt, loss_b

    key = jax.random.key(2)
    t0 = time.perf_counter()
    core, opt, loss_b = full_step(core, opt, key)
    jax.block_until_ready(loss_b)
    print("compile+first %.1fs loss=%.4f" % (time.perf_counter() - t0,
                                             float(loss_b)))
    times = []
    for i in range(3):
        key = jax.random.key(3 + i)
        t0 = time.perf_counter()
        core, opt, loss_b = full_step(core, opt, key)
        np.asarray(loss_b)
        times.append(time.perf_counter() - t0)
    wall = float(np.median(times))
    toks = N_FRAMES * 64
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(core))
    tflops = 6 * n_params * toks * 3 / 2 / wall / 1e12  # rough 3x remat
    print(f"{toks} tokens two-program: {wall:.3f} s/step "
          f"({toks/wall:.0f} tok/s)")


if __name__ == "__main__":
    main()
