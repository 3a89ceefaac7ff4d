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
    assert set(written) == {"video", "audio", "av"}
    assert all(os.path.exists(p) for p in written.values())


def test_draw_frames_shape():
    video = (np.random.RandomState(0).rand(2, 48, 64, 3) * 255).astype(
        np.uint8)
    out = draw_frames(video, np.zeros((2, 2)), np.ones((2, 11)))
    assert out.shape == video.shape
    assert out.dtype == np.uint8


def test_write_avi_muxed_av_roundtrip(tmp_path):
    """The pure-python AVI muxer must produce a file real players decode:
    cv2 (ffmpeg-independent MJPEG path) reads back every frame, and the
    RIFF audio stream carries the full PCM payload (VERDICT.md Missing #4:
    one watchable muxed AV artifact, reference to_wandb_av
    owl_wms/utils/logging.py:96-143)."""
    import struct
    import cv2
    from owl_audio_exps_tpu.utils.media import write_avi

    rs = np.random.RandomState(0)
    n, H, W, sr, fps = 12, 32, 48, 44100, 60
    # smooth gradient frames survive JPEG; add a moving bar for identity
    frames = np.zeros((n, H, W, 3), np.uint8)
    for i in range(n):
        frames[i, :, :, 0] = np.linspace(0, 255, W, dtype=np.uint8)[None, :]
        frames[i, :, (i * 3) % W] = 255
    wf = rs.randn(n * sr // fps, 2).astype(np.float32) * 0.1

    path = write_avi(str(tmp_path / "clip.avi"), frames, wf,
                     fps=fps, sample_rate=sr)

    cap = cv2.VideoCapture(path)
    assert cap.isOpened(), "cv2 cannot open the muxed AVI"
    got = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        got.append(frame[:, :, ::-1])  # BGR -> RGB
    cap.release()
    assert len(got) == n, f"decoded {len(got)} of {n} frames"
    # JPEG-lossy but close
    err = np.abs(got[0].astype(np.float32)
                 - frames[0].astype(np.float32)).mean()
    assert err < 8.0, f"frame content mangled (mean err {err})"

    # audio: walk the RIFF tree properly (byte-scanning false-positives
    # on JPEG payloads) and concatenate the 01wb stream
    blob = open(path, "rb").read()
    assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
    pcm = b""

    def walk(start, end):
        nonlocal pcm
        pos = start
        while pos + 8 <= end:
            fourcc = blob[pos:pos + 4]
            size = struct.unpack("<I", blob[pos + 4:pos + 8])[0]
            payload0 = pos + 8
            if fourcc == b"LIST":
                walk(payload0 + 4, payload0 + size)
            elif fourcc == b"01wb":
                pcm += blob[payload0:payload0 + size]
            pos = payload0 + size + (size % 2)

    walk(12, len(blob))
    expect = (np.clip(wf, -1, 1) * 32767).astype("<i2").tobytes()
    assert pcm == expect, "PCM payload mismatch in AVI"


def test_save_av_bundle_emits_single_av_artifact(tmp_path):
    from owl_audio_exps_tpu.utils.media import save_av_bundle

    frames = np.zeros((4, 16, 16, 3), np.float32)
    wf = np.zeros((4 * 735, 2), np.float32)
    written = save_av_bundle(str(tmp_path), "eval", video_frames=frames,
                             waveform=wf)
    assert "av" in written, "no muxed AV artifact"
    assert os.path.exists(written["av"])
    assert written["av"].endswith((".mp4", ".avi"))
