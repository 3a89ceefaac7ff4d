"""Two-program AV train step: the 640-frame single-chip cliff attack.

PERF.md's AV ladder ends at 512 frames: the 640-frame (41,600-token)
game_rft_audio step compiles and runs but falls off the axon scheduler
cliff (25.9 s/step, 7.4% MFU — 5-7x the per-token cost of 512). The
98k dit_v4 fit established the diagnosis (docs/LONGCTX.md): a
barely-fitting ONE-program step trades freed bytes for serialized
spills and the scheduler's memory target is unreachable through the
relay. scripts/tpu_two_program_98k.py broke that structure into a fwd
program + per-group backward programs; the 98k FORWARD runs and grads
verify at 16k. AV-640 is 2.4x smaller than 98k — this script points
the same structure at it (VERDICT r4 item 3).

Structure (mirrors tpu_two_program_98k.py; AV specifics):
  prologue = t_embed + control_embed + proj_in + audio_proj_in +
    per-frame interleave (models/gamerft_audio.py:47-78, identical
    submodule names);
  groups   = the scanned DiTGroup stack over the interleaved stream;
  epilogue = stream split + proj_out(layer_norm) + audio_proj_out +
    video/audio MSEs vs the shared-ts rectified-flow targets
    (models/gamerft_audio.py:130-151).

Usage:
  python scripts/tpu_two_program_av.py check [n_frames=64]
  python scripts/tpu_two_program_av.py fit [n_frames=640]
Env: OWL_MUON_BF16 / OWL_GRADS_BF16 / OWL_PARAMS_BF16 /
OWL_SPLASH_HEAD_CHUNKS / OWL_MLP_CHUNKS as in tpu_train_bench.py.
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
from owl_audio_exps_tpu.models.gamerft_audio import GameRFTAudio
from owl_audio_exps_tpu.nn.attn import DiTGroup
from owl_audio_exps_tpu.nn.embeddings import (TimestepEmbedding,
                                              ControlEmbedding)
from owl_audio_exps_tpu.nn.layers import FinalLayer, Linear
from owl_audio_exps_tpu.ops.norms import layer_norm

MODE = sys.argv[1] if len(sys.argv) > 1 else "check"
N_FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else \
    (64 if MODE == "check" else 640)
B = 1
BF16 = jnp.bfloat16
SS = 8          # sample_size: 8x8 video tokens + 1 audio = tpf 65
CV, CA = 128, 32


def build_cfg():
    return transformer_config(
        cfg_prob=0.0, n_frames=max(N_FRAMES, 256), causal=True,
        uncond=False, model_id="game_rft_audio", backbone="dit",
        has_audio=True, rope_impl="ortho", sample_size=SS,
        channels=CV, audio_channels=CA, n_layers=24, n_heads=24,
        d_model=1536, tokens_per_frame=SS * SS + 1, n_buttons=11,
        local_window=8, global_window=None,
        gradient_checkpointing=True, remat_granularity="group",
        splash_head_chunks=int(os.environ.get("OWL_SPLASH_HEAD_CHUNKS",
                                              "4")),
        mlp_chunks=int(os.environ.get("OWL_MLP_CHUNKS", "8")),
        scan_layers=True)


class ProAV(nn.Module):
    """models/gamerft_audio.py:47-78 with identical submodule names."""
    config: object
    dtype: jnp.dtype = BF16

    @nn.compact
    def __call__(self, lerpd_v, lerpd_a, ts, mouse, btn):
        cfg = self.config
        b, n, c, h, w = lerpd_v.shape
        t_cond = TimestepEmbedding(cfg.d_model, dtype=self.dtype,
                                   name="t_embed")(ts)
        ctrl = ControlEmbedding(cfg.n_buttons, cfg.d_model,
                                dtype=self.dtype,
                                name="control_embed")(mouse, btn)
        cond = t_cond + ctrl
        vid = jnp.transpose(lerpd_v, (0, 1, 3, 4, 2)).reshape(
            b, n * h * w, c)
        vid = Linear(cfg.d_model, use_bias=False, dtype=self.dtype,
                     name="proj_in")(vid.astype(self.dtype))
        aud = Linear(cfg.d_model, use_bias=False, dtype=self.dtype,
                     name="audio_proj_in")(lerpd_a.astype(self.dtype))
        vid_f = vid.reshape(b, n, h * w, cfg.d_model)
        stream = jnp.concatenate([vid_f, aud[:, :, None, :]], axis=2)
        return stream.reshape(b, n * (h * w + 1), cfg.d_model), cond


def pro_params(p):
    return {k: p[k] for k in ("t_embed", "control_embed", "proj_in",
                              "audio_proj_in")}


def epi_params(p):
    return {k: p[k] for k in ("proj_out", "audio_proj_out")}


def make_fns(cfg):
    prologue = ProAV(cfg)
    final_v = FinalLayer(cfg.d_model, CV, dtype=BF16)
    final_a = FinalLayer(cfg.d_model, CA, dtype=BF16)
    group = DiTGroup(cfg, dtype=BF16)
    cfg_b = cfg
    if os.environ.get("OWL_TWO_PROG_SEQ", "1") != "0":
        import copy
        cfg_b = copy.deepcopy(cfg)
        cfg_b.remat_sequenced = True
    group_b = DiTGroup(cfg_b, dtype=BF16)

    def noise(xv, xa, key):
        b, n = xv.shape[:2]
        r_ts, r_zv, r_za = jax.random.split(jax.random.fold_in(key, 7), 3)
        ts = jax.nn.sigmoid(jax.random.normal(r_ts, (b, n), jnp.float32))
        zv = jax.random.normal(r_zv, xv.shape, jnp.float32)
        za = jax.random.normal(r_za, xa.shape, jnp.float32)
        xvf, xaf = xv.astype(jnp.float32), xa.astype(jnp.float32)
        te_v = ts[:, :, None, None, None]
        te_a = ts[:, :, None]
        lerpd_v = (xvf * (1 - te_v) + zv * te_v).astype(BF16)
        lerpd_a = (xaf * (1 - te_a) + za * te_a).astype(BF16)
        return (ts.astype(BF16), lerpd_v, lerpd_a,
                zv - xvf, za - xaf)

    def run_group(gp, h, c):
        out, _ = group.apply({"params": gp}, h, c, None, None, None, True)
        return out

    def run_group_b(gp, h, c):
        out, _ = group_b.apply({"params": gp}, h, c, None, None, None,
                               True)
        return out

    def epilogue(po, stream, cond, target_v, target_a, vshape):
        b, n, c, h, w = vshape
        stream = stream.reshape(b, n, h * w + 1, cfg.d_model)
        video = stream[:, :, :-1].reshape(b, n * h * w, cfg.d_model)
        aud = stream[:, :, -1]
        video = final_v.apply({"params": po["proj_out"]},
                              layer_norm(video), layer_norm(cond))
        video = video.reshape(b, n, h, w, c).transpose(0, 1, 4, 2, 3)
        aud = final_a.apply({"params": po["audio_proj_out"]}, aud, cond)
        vl = jnp.mean(jnp.square(video.astype(jnp.float32) - target_v))
        al = jnp.mean(jnp.square(aud.astype(jnp.float32) - target_a))
        return vl + al

    @jax.jit
    def prog_a(params, xv, xa, mouse, btn, key):
        ts, lerpd_v, lerpd_a, tv, ta = noise(xv, xa, key)
        h0, cond = prologue.apply({"params": pro_params(params)},
                                  lerpd_v, lerpd_a, ts, mouse, btn)

        def body(h, gp):
            return run_group(gp, h, cond), h

        hG, bounds = jax.lax.scan(body, h0,
                                  params["transformer"]["groups"])
        loss = epilogue(epi_params(params), hG, cond, tv, ta, xv.shape)
        return loss, bounds, hG, cond

    @jax.jit
    def prog_epi_bwd(po, hG, cond, xv, xa, key):
        _, _, _, tv, ta = noise(xv, xa, key)
        loss, epi_vjp = jax.vjp(
            lambda po, h, c: epilogue(po, h, c, tv, ta, xv.shape),
            po, hG, cond)
        dpo, dh, dcond = epi_vjp(jnp.float32(1.0))
        return loss, dpo, dh.astype(BF16), dcond.astype(BF16)

    @partial(jax.jit, donate_argnums=(1, 3, 4, 5), static_argnums=(6,))
    def prog_group_bwd(gp, h_in, cond, dh, dcond_acc, dgroups, g):
        _, gvjp = jax.vjp(run_group_b, gp, h_in, cond)
        dgp, dh_in, dcond_g = gvjp(dh)
        dgroups = jax.tree.map(
            lambda buf, piece: jax.lax.dynamic_update_index_in_dim(
                buf, piece.astype(buf.dtype), g, 0),
            dgroups, dgp)
        return dgroups, dh_in, dcond_acc + dcond_g

    @jax.jit
    def prog_pro_bwd(pp, xv, xa, mouse, btn, key, dh0, dcond):
        ts, lerpd_v, lerpd_a, _, _ = noise(xv, xa, key)
        _, pro_vjp = jax.vjp(
            lambda pp: prologue.apply({"params": pp}, lerpd_v, lerpd_a,
                                      ts, mouse, btn), pp)
        (dpro,) = pro_vjp((dh0, dcond))
        if os.environ.get("OWL_GRADS_BF16") == "1":
            dpro = jax.tree.map(lambda g: g.astype(BF16), dpro)
        return dpro

    def hostloop_b(params, xv, xa, mouse, btn, key, bounds, hG, cond):
        G = bounds.shape[0]
        loss, dpo, dh, dcond = prog_epi_bwd(epi_params(params), hG,
                                            cond, xv, xa, key)
        groups = params["transformer"]["groups"]
        gdtype = BF16 if os.environ.get("OWL_GRADS_BF16") == "1" \
            else None
        dgroups = jax.tree.map(
            lambda a: jnp.zeros(a.shape, gdtype or a.dtype), groups)
        sync = os.environ.get("OWL_TWO_PROG_SYNC", "1") != "0"
        dbg = os.environ.get("OWL_TWO_PROG_DEBUG") == "1"
        for g in reversed(range(G)):
            gp = jax.tree.map(lambda a: a[g], groups)
            dgroups, dh, dcond = prog_group_bwd(
                gp, bounds[g], cond, dh, dcond, dgroups, g)
            del gp
            if sync:
                np.asarray(dcond[0, 0, 0])   # see 98k script: forces
                # the relay to retire donated buffers between groups
            if dbg:
                print(f"  group {g} done", flush=True)
        dpro = prog_pro_bwd(pro_params(params), xv, xa, mouse, btn,
                            key, dh, dcond)
        grads = dict(dpro)
        grads["transformer"] = {"groups": dgroups}
        grads.update(dpo)
        if os.environ.get("OWL_GRADS_BF16") == "1":
            grads = jax.tree.map(lambda g: g.astype(BF16), grads)
        return loss, grads

    return prog_a, hostloop_b


def main():
    cfg = build_cfg()
    model = GameRFTAudio(cfg, dtype=BF16)
    rs = np.random.RandomState(0)
    xv = jnp.asarray(rs.randn(B, N_FRAMES, CV, SS, SS), BF16)
    xa = jnp.asarray(rs.randn(B, N_FRAMES, CA), BF16)
    mouse = jnp.asarray(rs.randn(B, N_FRAMES, 2), BF16)
    btn = jnp.asarray(rs.rand(B, N_FRAMES, 11) > 0.5, BF16)

    params = jax.jit(lambda k: model.init(
        {"params": k, "noise": jax.random.key(1)}, xv, xa, mouse, btn
    )["params"])(jax.random.key(0))
    core = params["core"]
    if os.environ.get("OWL_PARAMS_BF16") == "1":
        core = jax.tree.map(lambda a: a.astype(BF16), core)
        del params
    prog_a, hostloop_b = make_fns(cfg)

    if MODE == "check":
        key = jax.random.key(2)
        loss_a, bounds, hG, cond = prog_a(core, xv, xa, mouse, btn, key)
        loss_b, grads = hostloop_b(core, xv, xa, mouse, btn, key,
                                   bounds, hG, cond)

        def ref_loss(p, key):
            from owl_audio_exps_tpu.models.gamerft_audio import \
                GameRFTAudioCore
            coremod = GameRFTAudioCore(cfg, dtype=BF16)
            b, n = xv.shape[:2]
            r_ts, r_zv, r_za = jax.random.split(
                jax.random.fold_in(key, 7), 3)
            ts = jax.nn.sigmoid(jax.random.normal(r_ts, (b, n),
                                                  jnp.float32))
            zv = jax.random.normal(r_zv, xv.shape, jnp.float32)
            za = jax.random.normal(r_za, xa.shape, jnp.float32)
            xvf, xaf = xv.astype(jnp.float32), xa.astype(jnp.float32)
            te_v = ts[:, :, None, None, None]
            te_a = ts[:, :, None]
            lerpd_v = (xvf * (1 - te_v) + zv * te_v).astype(BF16)
            lerpd_a = (xaf * (1 - te_a) + za * te_a).astype(BF16)
            (pv, pa), _ = coremod.apply(
                {"params": p}, lerpd_v, lerpd_a, ts.astype(BF16),
                mouse, btn)
            vl = jnp.mean(jnp.square(pv.astype(jnp.float32)
                                     - (zv - xvf)))
            al = jnp.mean(jnp.square(pa.astype(jnp.float32)
                                     - (za - xaf)))
            return vl + al

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
                               "audio_proj_in", "proj_out",
                               "audio_proj_out", "adaln", "gate"],
                   momentum_dtype=mom_dtype)
    opt = tx.init(core)

    import optax

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def prog_update(params, opt, grads):
        up, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, up), opt

    def full_step(core, opt, key):
        loss, bounds, hG, cond = prog_a(core, xv, xa, mouse, btn, key)
        loss_b, grads = hostloop_b(core, xv, xa, mouse, btn, key,
                                   bounds, hG, cond)
        del bounds, hG
        core, opt = prog_update(core, opt, grads)
        return core, opt, loss_b

    key = jax.random.key(2)
    t0 = time.perf_counter()
    core, opt, loss_b = full_step(core, opt, key)
    np.asarray(loss_b)
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
    toks = N_FRAMES * (SS * SS + 1)
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(core))
    # MFU accounting as scripts/tpu_train_bench.py: 6*N*T matmul FLOPs
    # x1.5 remat recompute + attention FLOPs, vs 197 TF/s v5e bf16 peak
    attn_fl = 0.0
    Cband = 8 * 65
    attn_fl += 18 * 4 * toks * (2 * Cband) * 64 * 2      # local layers
    attn_fl += 6 * 4 * toks * toks * 64 * 2 / 2          # global causal
    flops = 6 * n_params * toks * 1.5 + attn_fl * 1.5
    print(f"{toks} tokens two-program AV: {wall:.3f} s/step "
          f"({toks/wall:.0f} tok/s, {flops/wall/1e12:.1f} TF/s, "
          f"{flops/wall/1e12/197*100:.1f}% MFU)")


if __name__ == "__main__":
    main()
