"""MFU / throughput profiler.

Reference: owl_wms/utils/mfu.py:6-83 (fvcore FLOP counting + cuda-event
timing vs a hard-coded 1979 TFLOPs H100 peak). TPU version: FLOPs are
computed analytically from the transformer config (exact for the DiT
family — matmul-dominated), timing is host wall-clock around blocked
steps, and the peak is per-generation.
"""

from __future__ import annotations

import time
from typing import Optional

import jax

# peak bf16 TFLOPs per chip
TPU_PEAK_TFLOPS = {
    "v5e": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "v6e": 918.0,
    "cpu": 1.0,
}


def detect_peak_tflops() -> float:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return TPU_PEAK_TFLOPS["v5e"]
    for key, val in TPU_PEAK_TFLOPS.items():
        if key in kind.replace(" ", "").replace("lite", "e"):
            return val
    if "v5" in kind and "lite" in kind:
        return TPU_PEAK_TFLOPS["v5e"]
    return TPU_PEAK_TFLOPS["v5e"]


def transformer_flops_per_token(config, seq_len: int) -> float:
    """Forward FLOPs per token for the DiT stack (matmul terms only —
    the same accounting fvcore does for the reference)."""
    d = config.d_model
    L = config.n_layers
    # attention projections: qkv (3d^2) + out (d^2); mlp: 2 * 4d^2
    proj = 2 * (4 * d * d + 8 * d * d)
    # attention scores+values: 2 * 2 * seq * d per token, but local layers
    # attend to a window only
    flags_local = sum(1 for i in range(L)
                      if i % (config.get("local_idx", 4) or 4) != 0)
    flags_global = L - flags_local
    tpf = config.tokens_per_frame
    local_ctx = min(seq_len, (config.get("local_window") or 10 ** 9) * tpf)
    global_ctx = min(seq_len, (config.get("global_window") or 10 ** 9) * tpf)
    attn = 4 * d * (flags_local * local_ctx + flags_global * global_ctx) / L
    # modulation (adaln/gate ~ 6 d^2 per layer per frame-token, small) — skip
    return L * (proj + attn)


def training_flops_per_token(config, seq_len: int) -> float:
    return 3.0 * transformer_flops_per_token(config, seq_len)  # fwd + 2x bwd


class MFUProfiler:
    """Wrap a step fn; reports samples/s, achieved TFLOPs, and MFU.

    Reference contract: owl_wms/utils/mfu.py MFUProfiler (step timing x
    FLOP count), instantiable by trainers for periodic logging.
    """

    def __init__(self, config, batch_tokens: int, seq_len: int,
                 training: bool = True,
                 peak_tflops: Optional[float] = None):
        self.config = config
        self.batch_tokens = batch_tokens
        flops_fn = training_flops_per_token if training \
            else transformer_flops_per_token
        self.flops_per_step = flops_fn(config, seq_len) * batch_tokens
        self.peak_tflops = peak_tflops or detect_peak_tflops()
        self._t0 = None
        self._steps = 0
        self._elapsed = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_steps: int = 1):
        assert self._t0 is not None
        self._elapsed += time.perf_counter() - self._t0
        self._steps += n_steps
        self._t0 = None

    def report(self, reset: bool = True) -> dict:
        """Window-local stats: by default counters reset after each report
        so every log line reflects the steps since the previous one
        (cumulative averaging would smear compile time over the run)."""
        if self._steps == 0 or self._elapsed == 0:
            return {}
        sec_per_step = self._elapsed / self._steps
        tflops = self.flops_per_step / sec_per_step / 1e12
        n_chips = jax.device_count()
        if reset:
            self._steps = 0
            self._elapsed = 0.0
        return {
            "perf/sec_per_step": sec_per_step,
            "perf/tokens_per_sec": self.batch_tokens / sec_per_step,
            "perf/achieved_tflops": tflops,
            "perf/mfu": tflops / (self.peak_tflops * n_chips),
        }
