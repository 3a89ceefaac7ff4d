"""FrameMask's analytic block classification == elementwise evaluation.

ops/splash.FrameMask.__getitem__ short-circuits full/empty blocks in
closed form; this fuzzes every (window, causal, tpf) geometry over a
grid of block slices against the raw mask_function.
"""

import numpy as np
import pytest

from owl_audio_exps_tpu.ops.splash import FrameMask


@pytest.mark.parametrize("tpf,window,causal", [
    (4, None, True),
    (4, 3, True),
    (4, 3, False),
    (64, 16, True),
    (65, 8, True),
    (1, 2, True),
    (4, None, False),
])
def test_getitem_matches_elementwise(tpf, window, causal):
    L = 16 * tpf
    m = FrameMask((L, L), tpf, window, causal)
    qs = np.arange(L, dtype=np.int32)

    def oracle(q_sl, kv_sl):
        rows = qs[q_sl][:, None]
        cols = qs[kv_sl][None, :]
        return np.asarray(m.mask_function(rows, cols))

    # slice grid: aligned + misaligned block boundaries
    bounds = sorted({0, tpf, 2 * tpf, 3, L // 4, L // 2, L - 5, L})
    for i, qa in enumerate(bounds[:-1]):
        for qb in bounds[i + 1:]:
            for j, ka in enumerate(bounds[:-1]):
                for kb in bounds[j + 1:]:
                    got = m[slice(qa, qb), slice(ka, kb)]
                    want = oracle(slice(qa, qb), slice(ka, kb))
                    assert got.shape == want.shape
                    np.testing.assert_array_equal(
                        got, want,
                        err_msg=f"q[{qa}:{qb}] kv[{ka}:{kb}] "
                                f"tpf={tpf} w={window} causal={causal}")


def test_precompute_is_fast_for_banded_masks():
    """The whole point: classifying a 65k-token banded mask's blocks
    must not materialize O(L^2); budget it generously at 30 s (it was
    ~10 min before the short-circuit)."""
    import time
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_mask_info as mask_info_lib,
        splash_attention_mask as mask_lib,
    )
    L = 65536
    m = mask_lib.MultiHeadMask([FrameMask((L, L), 64, 16, True)])
    t0 = time.perf_counter()
    mask_info_lib.process_mask(m, (512, 512))
    dt = time.perf_counter() - t0
    assert dt < 30.0, f"mask-info precompute took {dt:.1f}s"
