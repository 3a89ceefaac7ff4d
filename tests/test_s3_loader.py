"""S3 loader internals testable without boto3: the randomized queue and
tar unpacking (reference: owl_wms/data/s3_cod_latent.py threads+queue)."""

import io
import random
import tarfile
import threading

import numpy as np
import pytest

from owl_audio_exps_tpu.data.s3_cod_latent import RandomizedQueue, S3CoDLoader


def test_randomized_queue_bounds_and_randomness():
    q = RandomizedQueue(max_size=4, seed=0)
    for i in range(4):
        assert q.put(i, timeout=0.1)
    assert not q.put(99, timeout=0.05)  # full
    got = [q.get() for _ in range(4)]
    assert sorted(got) == [0, 1, 2, 3]


def test_randomized_queue_threaded():
    q = RandomizedQueue(max_size=8, seed=1)
    received = []

    def consumer():
        for _ in range(100):
            received.append(q.get())

    t = threading.Thread(target=consumer)
    t.start()
    for i in range(100):
        q.put(i)
    t.join(timeout=10)
    assert sorted(received) == list(range(100))


def _make_tar(n_frames=8):
    import torch
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for stem in ("clip0", "clip1"):
            for suffix, shape in ((".latent.pt", (n_frames, 4, 2, 2)),
                                  (".mouse.pt", (n_frames, 2)),
                                  (".buttons.pt", (n_frames, 3))):
                data = io.BytesIO()
                torch.save(torch.randn(*shape), data)
                info = tarfile.TarInfo(stem + suffix)
                info.size = data.getbuffer().nbytes
                data.seek(0)
                tf.addfile(info, data)
    return buf.getvalue()


def test_unpack_tar_fills_queue():
    loader = S3CoDLoader.__new__(S3CoDLoader)  # skip boto3 __init__
    loader.queue = RandomizedQueue(max_size=100, seed=0)
    loader.window_length = 4
    loader.file_share_max = 3
    loader._rng = random.Random(0)

    loader._unpack_tar(_make_tar(n_frames=8))
    assert loader.queue.qsize() > 0
    vid, mouse, btn = loader.queue.get()
    assert vid.shape == (4, 4, 2, 2)
    assert mouse.shape == (4, 2)
    assert btn.shape == (4, 3)
    assert np.abs(vid).max() <= 8.0  # clamp applied


def test_loader_requires_boto3():
    with pytest.raises(ImportError, match="boto3"):
        S3CoDLoader(1, "bucket")
