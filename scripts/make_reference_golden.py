"""Generate a checked-in golden from the ACTUAL torch reference.

Builds a seeded small GameRFTAudioCore from /root/reference (CPU torch,
shimmed third-party deps), runs a deterministic n-step Euler trajectory
(SD3 shift-3 schedule), and writes tests/goldens/reference_av_small.npz
containing the torch state_dict, the inputs, the schedule, the per-step
velocities and the final latents.

tests/test_reference_golden.py then replays the same trajectory through
the JAX framework (weights imported via utils/torch_import.py) WITHOUT
needing torch or the reference mounted — a permanent regression anchor
for cross-framework numerical parity (reference denoiser math:
owl_wms/models/gamerft_audio.py:49-97; schedule:
owl_wms/sampling/schedulers.py:5-13).

Usage: python scripts/make_reference_golden.py
"""

import os
import sys
from types import SimpleNamespace

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

GOLDEN_PATH = os.path.join(REPO, "tests", "goldens",
                           "reference_av_small.npz")

CFG = dict(
    model_id="game_rft_audio", n_layers=2, n_heads=2, d_model=32,
    channels=4, sample_size=2, tokens_per_frame=5, n_frames=8,
    n_buttons=3, causal=True, uncond=False, cfg_prob=0.0,
    backbone="dit", has_audio=True, rope_impl="ortho",
    local_window=2, global_window=None, audio_channels=6)

N_STEPS = 4


def main():
    import torch
    torch._dynamo.config.automatic_dynamic_shapes = False
    import reference_shims
    reference_shims.install()

    import types as _types
    if "owl_wms.nn.mmattn" not in sys.modules:
        stub = _types.ModuleType("owl_wms.nn.mmattn")
        stub.MMDIT = None
        sys.modules["owl_wms.nn.mmattn"] = stub

    orig_compile = torch.compile
    torch.compile = lambda m, *a, **k: m
    try:
        from owl_wms.models.gamerft_audio import GameRFTAudioCore
        torch.manual_seed(7)
        core = GameRFTAudioCore(SimpleNamespace(**CFG)).eval().float()
    finally:
        torch.compile = orig_compile

    from owl_audio_exps_tpu.sampling.schedulers import get_sd3_euler
    dt = np.asarray(get_sd3_euler(N_STEPS), np.float32)

    rs = np.random.RandomState(1234)
    b, n = 1, CFG["n_frames"]
    x = rs.randn(b, n, CFG["channels"], CFG["sample_size"],
                 CFG["sample_size"]).astype(np.float32)
    audio = rs.randn(b, n, CFG["audio_channels"]).astype(np.float32)
    mouse = rs.randn(b, n, 2).astype(np.float32)
    btn = (rs.rand(b, n, CFG["n_buttons"]) > 0.5).astype(np.float32)

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

    sd = {f"sd::{k}": v.detach().float().numpy()
          for k, v in core.state_dict().items()}
    payload = dict(
        x=x, audio=audio, mouse=mouse, btn=btn, dt=dt,
        final_video=cur_v.numpy(), final_audio=cur_a.numpy(),
        n_heads=np.int32(CFG["n_heads"]),
        **sd,
    )
    for i, (pv, pa) in enumerate(vels):
        payload[f"v_video_{i}"] = pv
        payload[f"v_audio_{i}"] = pa

    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    np.savez_compressed(GOLDEN_PATH, **payload)
    size = os.path.getsize(GOLDEN_PATH) / 1024
    print(f"wrote {GOLDEN_PATH} ({size:.0f} KiB), "
          f"{len(sd)} state_dict tensors, {N_STEPS} steps")


if __name__ == "__main__":
    main()
