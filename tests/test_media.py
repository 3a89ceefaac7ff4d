"""Media export tests: gif/wav/channel-gif writers + overlay drawing."""

import os

import numpy as np

from owl_audio_exps_tpu.utils.media import (to_uint8_frames, write_gif,
                                            write_wav, channel_gifs,
                                            save_av_bundle)
from owl_audio_exps_tpu.utils.vis import draw_frames, KEYBINDS


def test_uint8_conversion():
    v = np.array([[[[-1.0, 0.0, 1.0]]]])
    u = to_uint8_frames(v)
    assert u.dtype == np.uint8
    assert u[0, 0, 0, 0] == 0 and u[0, 0, 0, 2] == 255


def test_gif_and_wav(tmp_path):
    frames = (np.random.RandomState(0).rand(4, 16, 16, 3)
              * 255).astype(np.uint8)
    p = write_gif(str(tmp_path / "a.gif"), frames, fps=60)
    assert os.path.getsize(p) > 0

    wf = np.sin(np.linspace(0, 100, 4410))[:, None] * np.ones((1, 2))
    p = write_wav(str(tmp_path / "a.wav"), wf)
    assert os.path.getsize(p) > 44
    from scipy.io import wavfile
    sr, data = wavfile.read(p)
    assert sr == 44100 and data.shape == (4410, 2)


def test_channel_gifs(tmp_path):
    latents = np.random.RandomState(0).randn(4, 3, 8, 8)
    paths = channel_gifs(latents, str(tmp_path), "s", channels=(0, 2))
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)


def test_av_bundle_with_overlays(tmp_path):
    video = np.random.RandomState(0).rand(3, 64, 64, 3) * 2 - 1
    wf = np.random.RandomState(1).randn(2205, 2) * 0.1
    mouse = np.random.RandomState(2).randn(3, 2)
    btn = (np.random.RandomState(3).rand(3, len(KEYBINDS)) > 0.5)
    written = save_av_bundle(str(tmp_path), "clip", video_frames=video,
                             waveform=wf, mouse=mouse, buttons=btn)
    assert set(written) == {"video", "audio"}
    assert all(os.path.exists(p) for p in written.values())


def test_draw_frames_shape():
    video = (np.random.RandomState(0).rand(2, 48, 64, 3) * 255).astype(
        np.uint8)
    out = draw_frames(video, np.zeros((2, 2)), np.ones((2, 11)))
    assert out.shape == video.shape
    assert out.dtype == np.uint8
