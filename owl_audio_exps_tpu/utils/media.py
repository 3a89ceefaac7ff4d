"""Media export: latent videos/audio -> gif / wav / npz artifacts.

Reference: owl_wms/utils/logging.py:96-203 (to_wandb gif grids,
to_wandb_av mp4+AAC via moviepy, to_wandb_samples channel gifs). moviepy
is not in this image, so the portable formats are GIF (PIL) and WAV
(scipy); when wandb is importable the same arrays are wrapped in
wandb.Video / wandb.Audio by ExperimentLogger.log_media.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def to_uint8_frames(video: np.ndarray) -> np.ndarray:
    """[n, H, W, 3] float in [-1, 1] -> uint8."""
    v = np.clip((np.asarray(video, dtype=np.float32) + 1.0) * 127.5, 0, 255)
    return v.astype(np.uint8)


def write_gif(path: str, frames: np.ndarray, fps: int = 60) -> str:
    """frames: [n, H, W, 3] uint8 (reference gif grids:
    owl_wms/utils/logging.py:83-94 use fps=60)."""
    from PIL import Image
    imgs = [Image.fromarray(f) for f in frames]
    duration_ms = max(int(1000 / fps), 20)  # GIF timing granularity
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=duration_ms, loop=0)
    return path


def write_wav(path: str, waveform: np.ndarray, sample_rate: int = 44100
              ) -> str:
    """waveform: [n_samples, channels] float in [-1, 1]; stereo 44.1 kHz
    is the reference audio format (BASELINE.md)."""
    from scipy.io import wavfile
    wf = np.clip(np.asarray(waveform, dtype=np.float32), -1.0, 1.0)
    wavfile.write(path, sample_rate, (wf * 32767).astype(np.int16))
    return path


def channel_gifs(latents: np.ndarray, out_dir: str, prefix: str,
                 channels: Sequence[int] = (0,), fps: int = 60):
    """Per-channel visualization gifs of latent video (the depth/flow
    channel exports of reference to_wandb_samples,
    owl_wms/utils/logging.py:146-176). latents: [n, c, h, w]."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for ch in channels:
        x = np.asarray(latents[:, ch], dtype=np.float32)
        lo, hi = x.min(), x.max()
        norm = (x - lo) / max(hi - lo, 1e-6)
        frames = (np.repeat(norm[..., None], 3, axis=-1) * 255).astype(
            np.uint8)
        paths.append(write_gif(
            os.path.join(out_dir, f"{prefix}_ch{ch}.gif"), frames, fps))
    return paths


def save_av_bundle(out_dir: str, name: str, video_frames: np.ndarray = None,
                   waveform: np.ndarray = None,
                   mouse: np.ndarray = None, buttons: np.ndarray = None,
                   fps: int = 60, sample_rate: int = 44100):
    """Joint AV export with optional control overlays — the offline
    analogue of to_wandb_av (owl_wms/utils/logging.py:96-143)."""
    os.makedirs(out_dir, exist_ok=True)
    written = {}
    if video_frames is not None:
        frames = to_uint8_frames(video_frames)
        if mouse is not None and buttons is not None:
            from .vis import draw_frames
            frames = draw_frames(frames, np.asarray(mouse),
                                 np.asarray(buttons))
        written["video"] = write_gif(
            os.path.join(out_dir, f"{name}.gif"), frames, fps)
    if waveform is not None:
        written["audio"] = write_wav(
            os.path.join(out_dir, f"{name}.wav"), waveform, sample_rate)
    return written


def wandb_video(video_frames: np.ndarray, fps: int = 60):
    """wandb.Video wrapper when wandb exists, else the raw array."""
    try:
        import wandb
        frames = to_uint8_frames(video_frames)       # [n, H, W, 3]
        return wandb.Video(np.transpose(frames, (0, 3, 1, 2)), fps=fps)
    except ImportError:
        return video_frames


def wandb_audio(waveform: np.ndarray, sample_rate: int = 44100):
    try:
        import wandb
        return wandb.Audio(np.asarray(waveform, dtype=np.float32),
                           sample_rate=sample_rate)
    except ImportError:
        return waveform
