"""Device prefetcher + profiling utility tests."""

import time

import numpy as np
import jax.numpy as jnp

from owl_audio_exps_tpu.data.prefetch import device_prefetch
from owl_audio_exps_tpu.utils.profiling import StepProfiler, trace_if


def test_prefetch_order_and_cast():
    def gen():
        for i in range(5):
            yield [np.full((2, 2), float(i), np.float32),
                   np.full((2,), i, np.int32)]

    out = list(x for x, _ in zip(device_prefetch(iter(gen())), range(5)))
    for i, (a, b) in enumerate(out):
        assert float(a[0, 0]) == float(i)
        assert a.dtype == jnp.bfloat16  # float cast
        assert b.dtype == jnp.int32    # ints untouched
        assert int(b[0]) == i


def test_prefetch_propagates_errors():
    def gen():
        yield [np.zeros(2, np.float32)]
        raise RuntimeError("loader died")

    it = device_prefetch(iter(gen()))
    next(it)
    try:
        next(it)
        assert False, "expected loader error"
    except RuntimeError as e:
        assert "loader died" in str(e)


def test_prefetch_exhaustion():
    """Finite iterators terminate cleanly (end-of-stream sentinel)."""
    def gen():
        for i in range(3):
            yield [np.zeros(2, np.float32)]

    items = list(device_prefetch(iter(gen()), size=2))
    assert len(items) == 3


def test_trace_if_noop(tmp_path):
    with trace_if(None):
        pass
    p = StepProfiler(None)
    p.maybe_start(10)
    p.maybe_stop(13)  # no-ops without a dir
