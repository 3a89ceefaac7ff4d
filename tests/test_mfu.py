"""MFU profiler accounting tests."""

import time

from owl_audio_exps_tpu.configs import transformer_config
from owl_audio_exps_tpu.utils.mfu import (MFUProfiler,
                                          transformer_flops_per_token,
                                          training_flops_per_token)


def cfg(**kw):
    base = dict(n_layers=4, n_heads=4, d_model=64, tokens_per_frame=4,
                local_window=2, global_window=None, local_idx=4,
                n_frames=64, sample_size=2)
    base.update(kw)
    return transformer_config(**base)


def test_flops_scaling():
    c = cfg()
    f1 = transformer_flops_per_token(c, 256)
    f2 = transformer_flops_per_token(c, 512)
    assert f2 > f1  # global-layer attention grows with context
    # projection floor: 12 d^2 per layer
    assert f1 > c.n_layers * 12 * c.d_model ** 2
    assert training_flops_per_token(c, 256) == 3.0 * f1


def test_local_window_reduces_flops():
    full = transformer_flops_per_token(cfg(local_window=None), 4096)
    windowed = transformer_flops_per_token(cfg(local_window=2), 4096)
    assert windowed < full


def test_profiler_report():
    p = MFUProfiler(cfg(), batch_tokens=1024, seq_len=256,
                    peak_tflops=100.0)
    p.start()
    time.sleep(0.01)
    p.stop()
    rep = p.report()
    assert 0 < rep["perf/mfu"] < 1e3
    assert rep["perf/sec_per_step"] >= 0.01
    assert rep["perf/tokens_per_sec"] > 0
