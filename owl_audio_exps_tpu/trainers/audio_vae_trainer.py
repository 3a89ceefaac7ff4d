"""Audio VAE trainer: waveform reconstruction + multi-resolution STFT loss.

The reference trains its VAEs in the external (un-vendored) ``owl-vaes``
repo and only consumes checkpoints through the bridge (SURVEY.md intro).
A complete standalone framework needs the training path in-repo: this
trainer fits nn/audio_vae.py's encoder/decoder pair on stereo waveforms
so the streaming audio path (BASELINE.md north star) is end-to-end
trainable here.

Loss: L1 waveform + multi-resolution STFT magnitude (the standard neural
-codec recipe) + a small latent L2 to keep the latent scale bounded.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..nn.audio_vae import AudioVAE
from ..data import get_loader
from .base import BaseTrainer, TrainState


def stft_mag(x: jnp.ndarray, frame: int, hop: int) -> jnp.ndarray:
    """Magnitude STFT of [b, T] via framed rFFT (hann window)."""
    b, T = x.shape
    n_frames = 1 + (T - frame) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(frame)[None, :])              # [F, frame]
    frames = x[:, idx]                                # [b, F, frame]
    win = jnp.hanning(frame).astype(x.dtype)
    spec = jnp.fft.rfft(frames * win, axis=-1)
    return jnp.abs(spec)


def multires_stft_loss(pred: jnp.ndarray, target: jnp.ndarray,
                       resolutions=((512, 128), (1024, 256), (2048, 512))
                       ) -> jnp.ndarray:
    """pred/target: [b, T, 2]. Sum of spectral-convergence + log-mag L1
    over resolutions, averaged over channels."""
    loss = 0.0
    for ch in range(pred.shape[-1]):
        p = pred[..., ch].astype(jnp.float32)
        t = target[..., ch].astype(jnp.float32)
        for frame, hop in resolutions:
            sp = stft_mag(p, frame, hop)
            st = stft_mag(t, frame, hop)
            sc = jnp.linalg.norm(st - sp) / (jnp.linalg.norm(st) + 1e-6)
            lm = jnp.mean(jnp.abs(jnp.log(st + 1e-5) - jnp.log(sp + 1e-5)))
            loss = loss + sc + lm
    n_terms = pred.shape[-1] * len(resolutions)
    return loss / n_terms


class AudioVAETrainer(BaseTrainer):
    """Fits the in-repo audio VAE on [b, T, 2] waveforms."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.vae = AudioVAE(
            latent_channels=self.model_cfg.get("channels", 64))

    def train(self, max_steps: Optional[int] = None):
        tkw = dict((self.train_cfg.data_kwargs or {}).items())
        loader = iter(get_loader(self.train_cfg.data_id,
                                 self.train_cfg.batch_size, **tkw))
        first = next(loader)
        wf0 = jnp.asarray(first[0] if isinstance(first, (list, tuple))
                          else first, jnp.bfloat16)

        variables = self.vae.init(jax.random.key(0), wf0)
        params = variables["params"]
        kwargs = dict((self.train_cfg.opt_kwargs or {}).items())
        tx = optax.adamw(kwargs.get("lr", 1e-4),
                         weight_decay=kwargs.get("weight_decay", 1e-4))
        self.tx = tx
        state = TrainState(params=params,
                           ema_params=jax.tree.map(jnp.copy, params),
                           opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))

        stft_w = self.train_cfg.get("stft_weight", 1.0)
        latent_w = self.train_cfg.get("latent_weight", 1e-3)

        def loss_fn(p, wf):
            recon, z = self.vae.apply({"params": p}, wf)
            l1 = jnp.mean(jnp.abs(recon - wf.astype(jnp.float32)))
            spec = multires_stft_loss(recon, wf)
            lat = jnp.mean(jnp.square(z.astype(jnp.float32)))
            loss = l1 + stft_w * spec + latent_w * lat
            return loss, {"loss": loss, "l1": l1, "stft": spec,
                          "latent_l2": lat}

        @jax.jit
        def step(state, wf):
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, wf)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            new_params = optax.apply_updates(state.params, updates)
            ema = jax.tree.map(
                lambda e, p: e * 0.999 + p * 0.001,
                state.ema_params, new_params)
            return TrainState(params=new_params, ema_params=ema,
                              opt_state=opt_state,
                              step=state.step + 1), metrics

        total = max_steps if max_steps is not None else \
            self.train_cfg.get("max_steps") or int(1e12)
        self.timer.reset()
        self.install_preemption_handler()
        wf = wf0
        try:
            while (self.total_step_counter < total
                   and not self.should_stop()):
                state, metrics = step(state, wf)
                self.metrics.log_dict(
                    {k: float(v) for k, v in metrics.items()})
                self.total_step_counter += 1
                log = self.metrics.pop()
                log["time"] = self.timer.hit()
                self.timer.reset()
                self.logger.log(log, step=self.total_step_counter)
                if self.total_step_counter % \
                        self.train_cfg.save_interval == 0:
                    self.save(state)
                nxt = next(loader)
                wf = jnp.asarray(nxt[0] if isinstance(nxt, (list, tuple))
                                 else nxt, jnp.bfloat16)
        finally:
            # also on exceptions: leaving the flag-setter installed
            # makes the surrounding process silently un-killable
            self.restore_preemption_handler()
        return state
