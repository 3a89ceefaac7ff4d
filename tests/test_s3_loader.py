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


def _make_tar(n_frames=8, audio=False, controls=True, stems=("clip0",
                                                             "clip1")):
    import torch
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for stem in stems:
            members = [(".latent.pt", (n_frames, 4, 2, 2))]
            if controls:
                members += [(".mouse.pt", (n_frames, 2)),
                            (".buttons.pt", (n_frames, 3))]
            if audio:
                members += [(".audiolatent.pt", (n_frames, 6))]
            for suffix, shape in members:
                data = io.BytesIO()
                torch.save(torch.randn(*shape), data)
                info = tarfile.TarInfo(stem + suffix)
                info.size = data.getbuffer().nbytes
                data.seek(0)
                tf.addfile(info, data)
    return buf.getvalue()


def _bare_loader(**over):
    loader = S3CoDLoader.__new__(S3CoDLoader)  # skip boto3 __init__
    loader.queue = RandomizedQueue(max_size=100, seed=0)
    loader.window_length = 4
    loader.file_share_max = 3
    loader.include_audio = False
    loader.zero_controls = False
    loader.n_buttons = 3
    loader.n_mouse_axes = 2
    loader._rng = random.Random(0)
    for k, v in over.items():
        setattr(loader, k, v)
    loader.n_cols = 4 if loader.include_audio else 3
    return loader


def test_unpack_tar_fills_queue():
    loader = _bare_loader()
    loader._unpack_tar(_make_tar(n_frames=8))
    assert loader.queue.qsize() > 0
    vid, mouse, btn = loader.queue.get()
    assert vid.shape == (4, 4, 2, 2)
    assert mouse.shape == (4, 2)
    assert btn.shape == (4, 3)
    assert np.abs(vid).max() <= 8.0  # clamp applied


def test_unpack_tar_file_share_max():
    """Windows drawn per file: min(file_share_max, n // window) each
    (reference: s3_cod_latent.py window sampling)."""
    loader = _bare_loader(file_share_max=2)
    loader._unpack_tar(_make_tar(n_frames=16))
    assert loader.queue.qsize() == 2 * 2  # 2 stems x file_share_max


def test_unpack_tar_audio_and_zero_controls():
    loader = _bare_loader(include_audio=True, zero_controls=True)
    loader._unpack_tar(_make_tar(n_frames=8, audio=True, controls=False))
    vid, mouse, btn, aud = loader.queue.get()
    assert aud.shape == (4, 6)
    assert np.all(mouse == 0) and np.all(btn == 0)
    assert mouse.shape == (4, 2) and btn.shape == (4, 3)


def test_loader_requires_boto3():
    with pytest.raises(ImportError, match="boto3"):
        S3CoDLoader(1, "bucket")


# ------------------------------------------------ fake-boto3 integration

class _FakeS3Client:
    """Minimal bucket-in-a-dict S3 client (list_objects_v2 paginator +
    download_fileobj), standing in for boto3 in CI."""

    def __init__(self, objects):
        self.objects = objects

    def get_paginator(self, op):
        assert op == "list_objects_v2"
        objects = self.objects

        class _P:
            def paginate(self, Bucket, Prefix=""):
                yield {"Contents": [{"Key": k} for k in sorted(objects)
                                    if k.startswith(Prefix)]}

        return _P()

    def download_fileobj(self, bucket, key, buf):
        buf.write(self.objects[key])


@pytest.fixture
def fake_boto3(monkeypatch):
    """Installs a fake boto3 module; yields the bucket dict to fill."""
    import sys
    import types
    objects = {}
    mod = types.ModuleType("boto3")
    mod.client = lambda svc: _FakeS3Client(objects)
    monkeypatch.setitem(sys.modules, "boto3", mod)
    return objects


def test_s3_loader_end_to_end(fake_boto3):
    """Full download->unpack->queue->batch path through the fake client,
    incl. the sleep_until_queues_filled startup barrier
    (reference: s3_cod_latent.py:16-206)."""
    fake_boto3["data/part0.tar"] = _make_tar(n_frames=8)
    fake_boto3["data/part1.tar"] = _make_tar(n_frames=8)
    fake_boto3["other/skip.txt"] = b"not a tar"
    loader = S3CoDLoader(2, "bucket", prefix="data/", window_length=4,
                         file_share_max=3)
    loader.sleep_until_queues_filled()
    vid, mouse, btn = next(iter(loader))
    assert vid.shape == (2, 4, 4, 2, 2)
    assert mouse.shape == (2, 4, 2)
    assert btn.shape == (2, 4, 3)
    assert vid.dtype == np.float32


def test_s3_mixed_loader_end_to_end(fake_boto3):
    """Mixed dual-queue loader: labelled tars carry controls, unlabelled
    tars don't (zeros synthesized); both carry audio; yields the
    reference collate order [vid, audio, mouse, btn, has_controls]
    (reference: s3_cod_latent_mixed.py:121-256)."""
    from owl_audio_exps_tpu.data.s3_cod_latent_mixed import get_loader

    fake_boto3["labelled/a.tar"] = _make_tar(n_frames=8, audio=True)
    fake_boto3["unlabelled/b.tar"] = _make_tar(n_frames=8, audio=True,
                                               controls=False)
    loader = get_loader(6, "bucket", labelled_prefix="labelled/",
                        unlabelled_prefix="unlabelled/", window_length=4,
                        unlabelled_frac=0.5, n_buttons=3, n_mouse_axes=2)
    loader.sleep_until_queues_filled()
    vid, aud, mouse, btn, flags = next(iter(loader))
    assert vid.shape == (6, 4, 4, 2, 2)
    assert aud.shape == (6, 4, 6)
    assert mouse.shape == (6, 4, 2)
    assert btn.shape == (6, 4, 3)
    assert flags.dtype == bool
    # unlabelled rows have zeroed controls; labelled rows (almost surely)
    # nonzero gaussians
    for i in range(6):
        if not flags[i]:
            assert np.all(mouse[i] == 0) and np.all(btn[i] == 0)
        else:
            assert np.abs(mouse[i]).sum() > 0


def test_s3_loader_audio_column_order(fake_boto3):
    """include_audio=True yields the DOCUMENTED [vid, audio, mouse, btn]
    order (audio in column 1 — the AV-trainer batch contract), not the
    internal queue-tuple order with audio appended last."""
    fake_boto3["av/part0.tar"] = _make_tar(n_frames=8, audio=True)
    loader = S3CoDLoader(2, "bucket", prefix="av/", window_length=4,
                         file_share_max=3, include_audio=True)
    loader.sleep_until_queues_filled()
    vid, aud, mouse, btn = next(iter(loader))
    assert vid.shape == (2, 4, 4, 2, 2)
    assert aud.shape == (2, 4, 6)      # audiolatent dim from _make_tar
    assert mouse.shape == (2, 4, 2)
    assert btn.shape == (2, 4, 3)
