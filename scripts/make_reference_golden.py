"""Generate checked-in goldens from the ACTUAL torch reference.

Builds seeded small reference cores from /root/reference (CPU torch,
shimmed third-party deps), runs deterministic trajectories, and writes
tests/goldens/*.npz containing the torch state_dict, inputs, schedule,
per-step velocities and final latents.

tests/test_reference_golden.py then replays the same trajectories
through the JAX framework (weights imported via utils/torch_import.py)
WITHOUT needing torch or the reference mounted — permanent regression
anchors for cross-framework numerical parity (reference denoiser math:
owl_wms/models/gamerft_audio.py:49-97; schedule:
owl_wms/sampling/schedulers.py:5-13).

Anchors:
* reference_av_small   — dit backbone, OrthoRoPE (round-3 original)
* reference_av_motion  — dit backbone, MotionRoPE (owl_wms/nn/rope.py:82-152)
* reference_av_uvit    — UViT backbone. The reference's UViT class is
  stale at this snapshot (DiTBlock(config) missing layer_idx;
  get_block_mask called with DiT's signature mismatched —
  owl_wms/nn/attn.py:218-232); the golden patches it MINIMALLY to the
  working design both sides agree on: all blocks global-window, same
  skip topology, reference DiTBlock/SkipConnection modules untouched.
* reference_av_mmdit   — MMDIT backbone (owl_wms/nn/mmattn.py). Its
  import of `create_causal_block_mask` does not exist in attn.py
  (SURVEY §2.11); the golden injects the one-line reconstruction from
  its call signature (MMDIT.get_block_mask, mmattn.py:133-144) in
  terms of the sibling get_block_mask. Everything else is the
  reference's own code.
* reference_cached_traj — KV-cached streaming trajectory on the video
  GameRFTCore: context cached at noise_prev, per-frame Euler decode
  against the growing cache, clean-frame re-encode (the exact
  av_caching_v2 discipline, owl_wms/sampling/av_caching_v2.py:63-137)
  with all noise draws passed in explicitly for determinism.

Usage: python scripts/make_reference_golden.py [anchor ...]
"""

import os
import sys
from types import SimpleNamespace

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")

BASE_CFG = dict(
    model_id="game_rft_audio", n_layers=2, n_heads=2, d_model=32,
    channels=4, sample_size=2, tokens_per_frame=5, n_frames=8,
    n_buttons=3, causal=True, uncond=False, cfg_prob=0.0,
    backbone="dit", has_audio=True, rope_impl="ortho",
    local_window=2, global_window=None, audio_channels=6)

N_STEPS = 4


def _setup_torch():
    import torch
    torch._dynamo.config.automatic_dynamic_shapes = False
    import reference_shims
    reference_shims.install()
    return torch


def _no_compile(torch):
    class _Ctx:
        def __enter__(self):
            self.orig = torch.compile
            torch.compile = lambda m, *a, **k: m

        def __exit__(self, *a):
            torch.compile = self.orig
    return _Ctx()


def _inject_mmattn_deps():
    """Reconstruct the missing create_causal_block_mask symbol
    (mmattn.py:12) from MMDIT.get_block_mask's call signature
    (n_tokens, tokens_per_frame, n_cached_tokens, window_len, device)
    in terms of the sibling, working get_block_mask (attn.py:24-62)."""
    import owl_wms.nn.attn as rattn
    if not hasattr(rattn, "create_causal_block_mask"):
        def create_causal_block_mask(n_tokens, tokens_per_frame,
                                     n_cached_tokens=0, window_len=None,
                                     device="cpu"):
            return rattn.get_block_mask(
                n_tokens=n_tokens, tokens_per_frame=tokens_per_frame,
                window_len=window_len, doc_id=None,
                q_offset=n_cached_tokens, is_causal=True, device=device)
        rattn.create_causal_block_mask = create_causal_block_mask
    sys.modules.pop("owl_wms.nn.mmattn", None)   # drop any stub


def _repair_uvit(torch):
    """Minimal repair of the stale reference UViT (attn.py:210-232):
    pass layer_idx to DiTBlock (all blocks non-local) and build one
    global-window causal mask with DiT's mask builder. Skip topology
    and every sub-module stay the reference's own."""
    import owl_wms.nn.attn as rattn
    from torch import nn as tnn

    def __init__(self, config):
        tnn.Module.__init__(self)
        self.config = config
        self.decoding = False
        self.blocks = tnn.ModuleList(
            [rattn.DiTBlock(config, i, False)
             for i in range(config.n_layers)])
        self.skip_projs = tnn.ModuleList(
            [rattn.SkipConnection(config)
             for _ in range(config.n_layers // 2)])

    def forward(self, x, cond, doc_id=None, kv_cache=None,
                local_block_mask=None, global_block_mask=None):
        q_offset = kv_cache.length_at(0) if kv_cache is not None else 0
        block_mask = None
        if not self.decoding:
            block_mask = rattn.get_block_mask(
                n_tokens=x.size(1) + q_offset,
                tokens_per_frame=self.config.tokens_per_frame,
                window_len=self.config.global_window, doc_id=doc_id,
                q_offset=q_offset, is_causal=self.config.causal,
                device=x.device)
        n_blocks = len(self.blocks)
        mid = n_blocks // 2
        early = []
        for i in range(mid):
            x = self.blocks[i](x, cond, block_mask, kv_cache)
            early.append(x)
        x = self.blocks[mid](x, cond, block_mask, kv_cache)
        for i in range(mid + 1, n_blocks):
            x = self.skip_projs[i - (mid + 1)](
                x, early[n_blocks - 1 - i], cond)
            x = self.blocks[i](x, cond, block_mask, kv_cache)
        return x

    rattn.UViT.__init__ = __init__
    rattn.UViT.forward = forward
    rattn.UViT.enable_decoding = lambda self: setattr(
        self, "decoding", True)
    rattn.UViT.disable_decoding = lambda self: setattr(
        self, "decoding", False)


def _build_av_core(torch, cfg):
    if cfg["backbone"] == "mmdit":
        _inject_mmattn_deps()
    else:
        import types as _types
        if "owl_wms.nn.mmattn" not in sys.modules:
            stub = _types.ModuleType("owl_wms.nn.mmattn")
            stub.MMDIT = None
            sys.modules["owl_wms.nn.mmattn"] = stub
    if cfg["backbone"] == "uvit":
        _repair_uvit(torch)
    with _no_compile(torch):
        from owl_wms.models.gamerft_audio import GameRFTAudioCore
        torch.manual_seed(7)
        return GameRFTAudioCore(SimpleNamespace(**cfg)).eval().float()


def _state_dict(core):
    return {f"sd::{k}": v.detach().float().numpy()
            for k, v in core.state_dict().items()}


def gen_av_golden(name, cfg):
    torch = _setup_torch()
    core = _build_av_core(torch, cfg)

    from owl_audio_exps_tpu.sampling.schedulers import get_sd3_euler
    dt = np.asarray(get_sd3_euler(N_STEPS), np.float32)

    rs = np.random.RandomState(1234)
    b, n = 1, cfg["n_frames"]
    x = rs.randn(b, n, cfg["channels"], cfg["sample_size"],
                 cfg["sample_size"]).astype(np.float32)
    audio = rs.randn(b, n, cfg["audio_channels"]).astype(np.float32)
    mouse = rs.randn(b, n, 2).astype(np.float32)
    btn = (rs.rand(b, n, cfg["n_buttons"]) > 0.5).astype(np.float32)

    cur_v = torch.from_numpy(x.copy())
    cur_a = torch.from_numpy(audio.copy())
    t = torch.ones(b, n)
    vels = []
    with torch.no_grad():
        for i in range(N_STEPS):
            pv, pa = core(cur_v, cur_a, t, torch.from_numpy(mouse),
                          torch.from_numpy(btn))
            vels.append((pv.numpy().copy(), pa.numpy().copy()))
            cur_v = cur_v - float(dt[i]) * pv
            cur_a = cur_a - float(dt[i]) * pa
            t = t - float(dt[i])

    payload = dict(
        x=x, audio=audio, mouse=mouse, btn=btn, dt=dt,
        final_video=cur_v.numpy(), final_audio=cur_a.numpy(),
        n_heads=np.int32(cfg["n_heads"]),
        **_state_dict(core),
    )
    for i, (pv, pa) in enumerate(vels):
        payload[f"v_video_{i}"] = pv
        payload[f"v_audio_{i}"] = pa
    _write(name, payload)


def gen_cached_traj_golden(name):
    """KV-cached streaming trajectory (video GameRFTCore), exact
    av_caching_v2 discipline with explicit noise draws."""
    torch = _setup_torch()
    import types as _types
    if "owl_wms.nn.mmattn" not in sys.modules:
        stub = _types.ModuleType("owl_wms.nn.mmattn")
        stub.MMDIT = None
        sys.modules["owl_wms.nn.mmattn"] = stub
    cfg = dict(BASE_CFG, model_id="game_rft", has_audio=False,
               tokens_per_frame=BASE_CFG["sample_size"] ** 2)
    cfg.pop("audio_channels")
    with _no_compile(torch):
        from owl_wms.models.gamerft import GameRFTCore
        torch.manual_seed(11)
        core = GameRFTCore(SimpleNamespace(**cfg)).eval().float()
    from owl_wms.nn.kv_cache import SingleKVCache

    n_ctx, n_gen, n_steps = 4, 2, 2
    noise_prev = 0.2
    dt = np.asarray([0.5, 0.5], np.float32)     # [1.0, 0.5] schedule

    rs = np.random.RandomState(77)
    b, c, ss = 1, cfg["channels"], cfg["sample_size"]
    total = n_ctx + n_gen
    ctx = rs.randn(b, n_ctx, c, ss, ss).astype(np.float32)
    z_ctx = rs.randn(*ctx.shape).astype(np.float32)        # ctx zlerp
    x1 = rs.randn(n_gen, b, 1, c, ss, ss).astype(np.float32)
    z_re = rs.randn(n_gen, b, 1, c, ss, ss).astype(np.float32)
    mouse = rs.randn(b, total, 2).astype(np.float32)
    btn = (rs.rand(b, total, cfg["n_buttons"]) > 0.5).astype(np.float32)

    cache = SingleKVCache(SimpleNamespace(**cfg)).to("cpu", torch.float32)
    cache.reset(b)

    tt = torch.from_numpy
    vels = []
    with torch.no_grad():
        ctx_noisy = tt(ctx) * (1 - noise_prev) + tt(z_ctx) * noise_prev
        t_ctx = torch.full((b, n_ctx), noise_prev)
        cache.enable_cache_updates()
        core(ctx_noisy, t_ctx, tt(mouse[:, :n_ctx]), tt(btn[:, :n_ctx]),
             kv_cache=cache)
        cache.disable_cache_updates()
        core.transformer.enable_decoding()
        finals = []
        for f in range(n_gen):
            cur = tt(x1[f].copy())
            t = torch.ones(b, 1)
            s = n_ctx + f
            m_f, b_f = tt(mouse[:, s:s + 1]), tt(btn[:, s:s + 1])
            for k in range(n_steps):
                pv = core(cur, t, m_f, b_f, kv_cache=cache)
                vels.append(pv.numpy().copy())
                cur = cur - float(dt[k]) * pv
                t = t - float(dt[k])
            finals.append(cur.numpy().copy())
            cur_noisy = cur * (1 - noise_prev) + tt(z_re[f]) * noise_prev
            cache.enable_cache_updates()
            core(cur_noisy, torch.full((b, 1), noise_prev), m_f, b_f,
                 kv_cache=cache)
            cache.disable_cache_updates()
        core.transformer.disable_decoding()

    payload = dict(
        ctx=ctx, z_ctx=z_ctx, x1=x1, z_re=z_re, mouse=mouse, btn=btn,
        dt=dt, noise_prev=np.float32(noise_prev),
        finals=np.stack(finals), vels=np.stack(vels),
        n_heads=np.int32(cfg["n_heads"]),
        **_state_dict(core),
    )
    _write(name, payload)


def _write(name, payload):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    np.savez_compressed(path, **payload)
    print(f"wrote {path} ({os.path.getsize(path)/1024:.0f} KiB)")


ANCHORS = {
    "reference_av_small": lambda: gen_av_golden(
        "reference_av_small", dict(BASE_CFG)),
    "reference_av_motion": lambda: gen_av_golden(
        "reference_av_motion", dict(BASE_CFG, rope_impl="motion")),
    "reference_av_uvit": lambda: gen_av_golden(
        "reference_av_uvit", dict(BASE_CFG, backbone="uvit", n_layers=3)),
    "reference_av_mmdit": lambda: gen_av_golden(
        "reference_av_mmdit", dict(BASE_CFG, backbone="mmdit")),
    "reference_cached_traj": lambda: gen_cached_traj_golden(
        "reference_cached_traj"),
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(ANCHORS)
    if len(names) == 1:
        ANCHORS[names[0]]()
    else:
        # one anchor per process: the mmattn stub / UViT repair mutate
        # reference module state and must not leak between anchors
        import subprocess
        for n in names:
            subprocess.run([sys.executable, os.path.abspath(__file__), n],
                           check=True)
