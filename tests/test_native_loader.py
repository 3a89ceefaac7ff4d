"""Native C++ gather path: builds the library, verifies bit-identical
batches vs the pure-python path, and exercises the loader integration."""

import numpy as np

from owl_audio_exps_tpu.data.native_loader import (native_available,
                                                   npy_data_offset,
                                                   gather_windows)
from owl_audio_exps_tpu.data.cod_latent import (WindowedViewDataset,
                                                EpochShuffleLoader)
from test_data import make_table


def test_native_library_builds():
    assert native_available(), "g++ build of native/owl_loader.cpp failed"


def test_npy_offset_parsing(tmp_path):
    arr = np.arange(24, dtype=np.float32).reshape(6, 4)
    p = tmp_path / "a.npy"
    np.save(p, arr)
    off, dtype, shape = npy_data_offset(str(p))
    assert shape == (6, 4) and dtype == np.float32
    raw = np.fromfile(p, dtype=np.float32, offset=off)
    np.testing.assert_array_equal(raw.reshape(6, 4), arr)


def test_gather_matches_numpy(tmp_path):
    rs = np.random.RandomState(0)
    paths, offsets = [], []
    arrays = []
    for i in range(3):
        arr = rs.randn(10, 4, 2).astype(np.float32)
        p = tmp_path / f"x{i}.npy"
        np.save(p, arr)
        off, dtype, shape = npy_data_offset(str(p))
        paths.append(str(p))
        offsets.append(off)
        arrays.append(arr)

    starts = [2, 0, 5]
    window = 4
    row_bytes = 4 * 2 * 4
    batch = gather_windows(paths, starts, window, row_bytes, offsets,
                           np.dtype(np.float32), (4, 2))
    assert batch.shape == (3, 4, 4, 2)
    for i in range(3):
        np.testing.assert_array_equal(batch[i],
                                      arrays[i][starts[i]:starts[i] + 4])


def test_dataset_batch_matches_items(tmp_path):
    make_table(tmp_path / "tbl", lens=(12, 9))
    ds = WindowedViewDataset(str(tmp_path / "tbl"), window_length=4)
    idxs = list(range(len(ds)))
    batch = ds.batch(idxs, ["video", "mouse"])
    for j, i in enumerate(idxs):
        item = ds[i]
        np.testing.assert_array_equal(batch["video"][j], item["video"])
        np.testing.assert_array_equal(batch["mouse"][j], item["mouse"])


def test_loader_uses_native_path(tmp_path):
    make_table(tmp_path / "tbl", lens=(20, 20))
    ds = WindowedViewDataset(str(tmp_path / "tbl"), window_length=5)
    loader = EpochShuffleLoader(ds, batch_size=2,
                                batch_columns=["video", "buttons"])
    vid, btn = next(iter(loader))
    assert vid.shape == (2, 5, 4, 2, 2)
    assert vid.dtype == np.float32
