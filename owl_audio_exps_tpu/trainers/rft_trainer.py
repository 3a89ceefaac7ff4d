"""Rectified-flow trainers: video (rft), joint AV (av), audio (audio_rft),
mixed-control AV (mixed_av).

Reference: owl_wms/trainers/rft_trainer.py, av_trainer.py,
audio_rft_trainer.py, mixed_av_trainer.py. Shared loop (train():
epoch/batch iteration, grad accum, clip-10 for non-Muon, EMA per step,
interval eval/save) lives in RFTFamilyTrainer; subclasses define the
model, batch->loss mapping, and eval sampling.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import get_model_cls, get_core_cls
from ..data import get_loader
from ..data.prefetch import device_prefetch
from ..sampling import get_sampler_cls
from .base import BaseTrainer, TrainState


def _stack_accum(batches):
    """List of accum micro-batches (each a list of arrays) -> pytree with
    leading [accum, ...]."""
    n_cols = len(batches[0])
    return [np.stack([b[i] for b in batches]) for i in range(n_cols)]


class RFTFamilyTrainer(BaseTrainer):
    """Common loop for the flow-matching trainers."""

    model_id: str = None

    def __init__(self, cfg):
        super().__init__(cfg)
        model_id = self.model_cfg.model_id or self.model_id
        self.model = get_model_cls(model_id)(self.model_cfg)
        self.core = get_core_cls(model_id)(self.model_cfg)

    # ---- subclass hooks -------------------------------------------------
    def loss_fn(self, params, batch, rng):
        raise NotImplementedError

    def example_batch(self):
        raise NotImplementedError

    def eval_step(self, state: TrainState, sample_loader, sampler):
        return {}

    # ---- shared loop ----------------------------------------------------
    def init_state(self) -> TrainState:
        batch = self.example_batch()
        args = self.batch_to_model_args(batch)
        return super().init_state(
            self.model,
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            *args)

    def batch_to_model_args(self, batch):
        raise NotImplementedError

    def train(self, max_steps: Optional[int] = None):
        accum = self.accum_steps()
        state = self.init_state()

        if self.train_cfg.resume_ckpt:
            state = self.load(self.train_cfg.resume_ckpt, state)
            self.total_step_counter = int(state.step)

        loader = get_loader(self.train_cfg.data_id,
                            self.train_cfg.batch_size,
                            **dict((self.train_cfg.data_kwargs or {}).items()))
        if hasattr(loader, "sleep_until_queues_filled"):
            loader.sleep_until_queues_filled()
            self.barrier()

        sampler = None
        sample_loader = None
        if self.train_cfg.sampler_id:
            skw = dict((self.train_cfg.sampler_kwargs or {}).items())
            sampler = get_sampler_cls(self.train_cfg.sampler_id)(**skw)
            if self.train_cfg.get("sample_data_id"):
                sample_loader = iter(get_loader(
                    self.train_cfg.sample_data_id,
                    self.train_cfg.n_samples,
                    **dict((self.train_cfg.get("sample_data_kwargs")
                            or {}).items())))

        step_fn = self.make_train_step(
            self._wrapped_loss, accum, clip_norm=self.grad_clip_norm())

        # throughput / MFU profiler (reference: owl_wms/utils/mfu.py)
        from ..utils.mfu import MFUProfiler
        seq_tokens = self._seq_tokens()
        profiler = MFUProfiler(
            self.model_cfg,
            batch_tokens=accum * self.train_cfg.batch_size * seq_tokens,
            seq_len=seq_tokens, training=True)

        # process-uniform key: the rng rides the jitted step as a
        # REPLICATED argument, so under multi-host SPMD every process
        # must pass the same value (per-example noise diversity comes
        # from jax.random partitioning over the globally-sharded batch)
        rng = jax.random.key(1234)
        self.timer.reset()
        self.install_preemption_handler()
        try:
            return self._train_loop(state, max_steps, accum, loader,
                                    sampler, sample_loader, step_fn,
                                    profiler, rng)
        finally:
            # also on exceptions: leaving the flag-setter installed
            # makes the surrounding process silently un-killable
            self.restore_preemption_handler()

    def _train_loop(self, state, max_steps, accum, loader, sampler,
                    sample_loader, step_fn, profiler, rng):
        from ..utils.profiling import StepProfiler
        step_profiler = StepProfiler(self.train_cfg.get("profile_dir"),
                                     start=self.train_cfg.get(
                                         "profile_start", 10))

        total = max_steps if max_steps is not None else \
            self.train_cfg.get("max_steps") or int(1e12)

        data_iter = iter(loader)

        # background host->device pipeline: stacking + transfer overlap the
        # device step (replaces torch DataLoader prefetch_factor)
        def stacked_gen():
            while True:
                yield _stack_accum([next(data_iter) for _ in range(accum)])

        prefetched = device_prefetch(stacked_gen(), size=2,
                                     put_fn=self.stacked_batch_put())

        # metrics stay on-device between drains so the host never blocks
        # mid-window and XLA keeps >= log_interval steps in flight
        from ..utils.logging import DeferredMetrics
        pending = DeferredMetrics()
        log_interval = self.log_interval()
        profiler.start()

        while self.total_step_counter < total:
            if self.should_stop():
                for _, m in pending.drain():
                    self.metrics.log_dict(m)
                self.save(state)
                break
            batch_stack = next(prefetched)
            rng, step_rng = jax.random.split(rng)
            step_profiler.maybe_start(self.total_step_counter)
            state, metrics = step_fn(state, batch_stack, step_rng)
            pending.append(self.total_step_counter + 1, metrics)
            step_profiler.maybe_stop(self.total_step_counter)
            self.total_step_counter += 1

            do_sample = sampler is not None and \
                self.total_step_counter % self.train_cfg.sample_interval == 0
            do_save = \
                self.total_step_counter % self.train_cfg.save_interval == 0
            boundary = (self.total_step_counter % log_interval == 0
                        or do_sample or do_save
                        or self.total_step_counter >= total)
            if not boundary:
                continue

            # ---- the only host sync in the loop
            drained = pending.drain()
            for _, m in drained:
                self.metrics.log_dict(m)
            profiler.stop(n_steps=len(drained))
            log = self.metrics.pop()
            log["time"] = self.timer.hit() / max(1, len(drained))
            log.update(profiler.report())
            if do_sample:
                log.update(self.eval_step(state, sample_loader, sampler))
            self.logger.log(log, step=self.total_step_counter)
            if do_save:
                self.save(state)
            # eval/save time is excluded from the next window's step timing
            self.timer.reset()
            profiler.start()
        from ..utils.checkpoints import wait_for_checkpoints
        wait_for_checkpoints()
        return state

    def _wrapped_loss(self, params, batch, rng):
        return self.loss_fn(params, batch, rng)

    def _seq_tokens(self) -> int:
        """Tokens per sample for FLOP accounting."""
        n = (self.train_cfg.data_kwargs or {}).get(
            "window_length", self.model_cfg.n_frames)
        if self.model_cfg.model_id == "audio_rft":
            n = self.model_cfg.sample_size
        return n * self.model_cfg.tokens_per_frame \
            if self.model_cfg.model_id != "audio_rft" else n


class RFTTrainer(RFTFamilyTrainer):
    """Video RFT from latents (reference: rft_trainer.py:25-281).
    Batch: [vid, mouse, btn] or [vid, mouse, btn, doc_id]."""

    model_id = "game_rft"

    def batch_to_model_args(self, batch):
        vid, mouse, btn = batch[:3]
        return (jnp.asarray(vid, jnp.bfloat16), jnp.asarray(mouse),
                jnp.asarray(btn))

    def example_batch(self):
        c = self.model_cfg
        n = (self.train_cfg.data_kwargs or {}).get("window_length", c.n_frames)
        b = self.train_cfg.batch_size
        return [np.zeros((b, n, c.channels, c.sample_size, c.sample_size),
                         np.float32),
                np.zeros((b, n, c.get("n_mouse_axes", 2)), np.float32),
                np.zeros((b, n, c.n_buttons), np.float32)]

    def loss_fn(self, params, batch, rng):
        vid, mouse, btn = batch[0], batch[1], batch[2]
        doc_id = batch[3] if len(batch) > 3 else None
        vid = (vid / self.train_cfg.vae_scale).astype(jnp.bfloat16)
        loss = self.model.apply({"params": params}, vid, mouse, btn, doc_id,
                                rngs={"noise": rng})
        return loss, {"diffusion_loss": loss}

    def eval_step(self, state, sample_loader, sampler):
        if sample_loader is None:
            return {}
        # multi-host: eval inputs ride the sampler jit REPLICATED, so
        # every process must feed the identical batch (process 0's)
        batch = self.broadcast_eval_batch(next(sample_loader))
        vid, mouse, btn = [jnp.asarray(x) for x in batch[:3]]
        vid = (vid / self.train_cfg.vae_scale).astype(jnp.bfloat16)
        ctx_len = max(1, vid.shape[1] // 2)
        latents = sampler(self.core, {"params": state.ema_params["core"]},
                          vid[:, :ctx_len], mouse, btn, jax.random.key(0))
        out = {"eval/latent_std": float(jnp.std(latents))}
        sdir = self.train_cfg.get("eval_sample_dir")
        if sdir and self.is_main:
            import os
            os.makedirs(sdir, exist_ok=True)
            np.save(os.path.join(
                sdir, f"samples_{self.total_step_counter}.npy"),
                np.asarray(latents, dtype=np.float32))
        return out


class AVRFTTrainer(RFTFamilyTrainer):
    """Joint AV RFT (reference: av_trainer.py:23-261).
    Batch: [vid, audio, mouse, btn]."""

    model_id = "game_rft_audio"

    def batch_to_model_args(self, batch):
        vid, audio, mouse, btn = batch[:4]
        return (jnp.asarray(vid, jnp.bfloat16),
                jnp.asarray(audio, jnp.bfloat16),
                jnp.asarray(mouse), jnp.asarray(btn))

    def example_batch(self):
        c = self.model_cfg
        n = (self.train_cfg.data_kwargs or {}).get("window_length", c.n_frames)
        b = self.train_cfg.batch_size
        return [np.zeros((b, n, c.channels, c.sample_size, c.sample_size),
                         np.float32),
                np.zeros((b, n, c.audio_channels), np.float32),
                np.zeros((b, n, c.get("n_mouse_axes", 2)), np.float32),
                np.zeros((b, n, c.n_buttons), np.float32)]

    def loss_fn(self, params, batch, rng):
        vid, audio, mouse, btn = batch[:4]
        vid = (vid / self.train_cfg.vae_scale).astype(jnp.bfloat16)
        audio_scale = self.train_cfg.get("audio_vae_scale",
                                         self.train_cfg.vae_scale)
        audio = (audio / audio_scale).astype(jnp.bfloat16)
        loss, v_loss, a_loss = self.model.apply(
            {"params": params}, vid, audio, mouse, btn, rngs={"noise": rng})
        return loss, {"diffusion_loss": loss, "video_loss": v_loss,
                      "audio_loss": a_loss}

    def eval_step(self, state, sample_loader, sampler):
        if sample_loader is None:
            return {}
        # multi-host: identical replicated eval inputs on every process
        batch = self.broadcast_eval_batch(next(sample_loader))
        vid, audio, mouse, btn = [jnp.asarray(x) for x in batch[:4]]
        vid = (vid / self.train_cfg.vae_scale).astype(jnp.bfloat16)
        audio = audio.astype(jnp.bfloat16)
        _, _, xl, al, em, eb = sampler(
            self.core, {"params": state.ema_params["core"]},
            vid, audio, mouse, btn, jax.random.key(0))
        self._export_media(xl, al, em, eb)
        return {"eval/video_latent_std": float(jnp.std(xl)),
                "eval/audio_latent_std": float(jnp.std(al))}

    def _export_media(self, video_latents, audio_latents, mouse, btn):
        """Decode + export eval samples (the to_wandb_av analogue,
        reference: av_trainer.py eval media) when eval_media_dir is set."""
        out_dir = self.train_cfg.get("eval_media_dir")
        if not out_dir or not self.is_main:
            return
        # samplers may return differently-extended latent vs control
        # streams (window samplers trim context) — crop all to the
        # common trailing window so frames/controls stay frame-aligned
        n = min(video_latents.shape[1], audio_latents.shape[1],
                mouse.shape[1], btn.shape[1])
        video_latents, audio_latents, mouse, btn = (
            video_latents[:, -n:], audio_latents[:, -n:],
            mouse[:, -n:], btn[:, -n:])
        from ..utils.owl_vae_bridge import (
            get_decoder_only, get_audio_encoder_decoder,
            make_batched_decode_fn, make_batched_audio_decode_fn)
        from ..utils.media import save_av_bundle
        if not hasattr(self, "_media_decoders"):
            dec = get_decoder_only(self.train_cfg.vae_id,
                                   self.train_cfg.get("vae_cfg_path"),
                                   self.train_cfg.get("vae_ckpt_path"),
                                   latent_channels=self.model_cfg.channels)
            _, adec = get_audio_encoder_decoder(
                latent_channels=self.model_cfg.audio_channels)
            self._media_decoders = (
                make_batched_decode_fn(dec, self.train_cfg.vae_batch_size),
                make_batched_audio_decode_fn(adec,
                                             self.train_cfg.vae_batch_size))
        vdec, adec = self._media_decoders
        frames = np.asarray(vdec(
            video_latents[:1] * self.train_cfg.vae_scale)[0],
            dtype=np.float32)
        wf = np.asarray(adec(
            audio_latents[:1] * self.train_cfg.get("audio_vae_scale", 1.0)
        )[0], dtype=np.float32)
        save_av_bundle(out_dir, f"step_{self.total_step_counter}",
                       video_frames=frames, waveform=wf,
                       mouse=np.asarray(mouse[0], dtype=np.float32),
                       buttons=np.asarray(btn[0], dtype=np.float32))


class MixedAVRFTTrainer(AVRFTTrainer):
    """JOINT AV RFT on mixed labelled/unlabelled controls (reference:
    mixed_av_trainer.py:154-162 — ``self.model(batch_vid, batch_audio,
    batch_mouse, batch_btn, has_controls=cfg_mask)``). Batch follows the
    mixed collate order [vid, audio, mouse, btn, has_controls]; logs the
    unlabelled proportion (mixed_av_trainer.py:190)."""

    model_id = "game_rft_audio"

    def example_batch(self):
        b = self.train_cfg.batch_size
        return super().example_batch() + [np.ones((b,), dtype=bool)]

    def loss_fn(self, params, batch, rng):
        vid, audio, mouse, btn, has_controls = batch[:5]
        vid = (vid / self.train_cfg.vae_scale).astype(jnp.bfloat16)
        audio_scale = self.train_cfg.get("audio_vae_scale",
                                         self.train_cfg.vae_scale)
        audio = (audio / audio_scale).astype(jnp.bfloat16)
        loss, v_loss, a_loss = self.model.apply(
            {"params": params}, vid, audio, mouse, btn,
            has_controls=has_controls.astype(bool), rngs={"noise": rng})
        unlabelled = 1.0 - jnp.mean(has_controls.astype(jnp.float32))
        return loss, {"diffusion_loss": loss, "video_loss": v_loss,
                      "audio_loss": a_loss,
                      "unlabelled_proportion": unlabelled}


class AudioRFTTrainer(RFTFamilyTrainer):
    """Unconditional audio RFT (reference: audio_rft_trainer.py:23-293).

    The reference loads raw stereo waveforms and encodes on-device with a
    frozen VAE encoder each step (audio_rft_trainer.py:103-104). Here the
    loader may yield either waveforms [b, n_samples, 2] (encoded via the
    in-repo audio VAE bridge) or pre-encoded latents [b, n, c]."""

    model_id = "audio_rft"

    def __init__(self, cfg):
        super().__init__(cfg)
        self.encode_fn = None
        if self.train_cfg.get("vae_ckpt_path") or \
                self.train_cfg.get("vae_cfg_path"):
            from ..utils.owl_vae_bridge import get_audio_encoder_decoder
            enc, _ = get_audio_encoder_decoder(
                self.train_cfg.get("vae_cfg_path"),
                self.train_cfg.get("vae_ckpt_path"))
            self.encode_fn = enc

    def batch_to_model_args(self, batch):
        lat = self._to_latents(jnp.asarray(batch[0] if isinstance(
            batch, (list, tuple)) else batch))
        return (lat.astype(jnp.bfloat16),)

    def _to_latents(self, x):
        if x.ndim == 3 and x.shape[-1] == 2 and self.encode_fn is not None:
            lat = self.encode_fn(x)
            return lat / self.train_cfg.vae_scale
        return x

    def example_batch(self):
        c = self.model_cfg
        b = self.train_cfg.batch_size
        if self.encode_fn is not None:
            n = (self.train_cfg.data_kwargs or {}).get("window_length", 88200)
            return [np.zeros((b, n, 2), np.float32)]
        return [np.zeros((b, c.sample_size, c.channels), np.float32)]

    def loss_fn(self, params, batch, rng):
        x = batch[0] if isinstance(batch, (list, tuple)) else batch
        lat = self._to_latents(x).astype(jnp.bfloat16)
        loss = self.model.apply({"params": params}, lat,
                                rngs={"noise": rng})
        return loss, {"diffusion_loss": loss}

    def eval_step(self, state, sample_loader, sampler):
        c = self.model_cfg
        b = min(self.train_cfg.n_samples, 4)
        ctx = jax.random.normal(jax.random.key(7),
                                (b, c.sample_size // 2, c.channels),
                                jnp.bfloat16)
        latents = sampler(self.core, {"params": state.ema_params["core"]},
                          ctx, jax.random.key(8))
        out = {"eval/audio_latent_std": float(jnp.std(latents))}
        # decode + export wav clips (reference: audio_rft_trainer.py:286-291
        # logs wandb.Audio at 44.1 kHz)
        out_dir = self.train_cfg.get("eval_media_dir")
        if out_dir and self.is_main:
            from ..utils.owl_vae_bridge import (get_audio_encoder_decoder,
                                                make_batched_audio_decode_fn)
            from ..utils.media import write_wav
            import os
            if not hasattr(self, "_audio_decoder"):
                _, dec = get_audio_encoder_decoder(
                    self.train_cfg.get("vae_cfg_path"),
                    self.train_cfg.get("vae_ckpt_path"),
                    latent_channels=c.channels)
                self._audio_decoder = make_batched_audio_decode_fn(
                    dec, self.train_cfg.vae_batch_size)
            wf = np.asarray(self._audio_decoder(
                latents[:1] * self.train_cfg.vae_scale)[0],
                dtype=np.float32)
            os.makedirs(out_dir, exist_ok=True)
            write_wav(os.path.join(
                out_dir, f"audio_{self.total_step_counter}.wav"), wf)
        return out
