"""Interactive game loop: keyboard/mouse -> streaming pipeline -> display.

Reference: inference/game_cv.py:25-223 (python-xlib window + XPutImage
blit at a 60 FPS target, keymap W A S D LSHIFT SPACE R F E + LMB/RMB,
y/u buffer resets, o/i sampling-step adjustment, Escape/q quit).

Structure here: ``GameCV`` owns the input-mapping / loop / stats logic
against a small display-backend interface, so the event handling is unit
testable with a fake backend; ``X11Backend`` implements that interface
with python-xlib when it and $DISPLAY exist; ``HeadlessBackend``
exercises the full pipeline loop without a display (FPS/latency stats
either way, reference game_cv.py:200-215).
"""

from __future__ import annotations

import time
from typing import List, Optional, Tuple

import numpy as np

KEYBINDS = ["W", "A", "S", "D", "LSHIFT", "SPACE", "R", "F", "E",
            "LMB", "RMB"]

# key name -> slot in the 11-button vector (reference game_cv.py:27-39)
KEYMAP = {
    "w": 0, "a": 1, "s": 2, "d": 3, "shift_l": 4, "space": 5,
    "r": 6, "f": 7, "e": 8,
}
# X11 pointer buttons (reference _handle_button: 1 = LMB -> 9, 3 = RMB -> 10)
BUTTONMAP = {1: 9, 3: 10}


class HeadlessBackend:
    """No-display backend: no events, no blit — drives the pipeline loop
    for RTF/latency measurement on servers."""

    def poll_events(self) -> List[tuple]:
        return []

    def query_pointer(self) -> Tuple[int, int]:
        return (0, 0)

    def blit(self, frame: np.ndarray):
        pass

    def close(self):
        pass


class X11Backend:
    """python-xlib window; normalizes events to
    ("key", name, pressed) / ("button", n, pressed) / ("close",)."""

    def __init__(self, width: int = 640, height: int = 360, display=None):
        import Xlib.display
        from Xlib import X, Xatom

        self._X = X
        self.width, self.height = width, height
        self.disp = display or Xlib.display.Display()
        screen = self.disp.screen()
        self.win = screen.root.create_window(
            0, 0, width, height, 0,
            screen.root_depth, X.InputOutput, X.CopyFromParent,
            background_pixel=screen.black_pixel,
            event_mask=(X.ExposureMask | X.KeyPressMask | X.KeyReleaseMask
                        | X.ButtonPressMask | X.ButtonReleaseMask
                        | X.PointerMotionMask | X.StructureNotifyMask))
        self.win.set_wm_name("owl game - X11")
        self.gc = self.win.create_gc()
        self.win.map()
        self.WM_DELETE = self.disp.intern_atom("WM_DELETE_WINDOW")
        self.win.change_property(self.disp.intern_atom("WM_PROTOCOLS"),
                                 Xatom.ATOM, 32, [self.WM_DELETE])

    def poll_events(self) -> List[tuple]:
        from Xlib import X, XK
        out = []
        while self.disp.pending_events():
            ev = self.disp.next_event()
            if ev.type == X.ClientMessage and ev.data[0] == self.WM_DELETE:
                out.append(("close",))
            elif ev.type in (X.KeyPress, X.KeyRelease):
                keysym = self.disp.keycode_to_keysym(ev.detail, 0)
                name = XK.keysym_to_string(keysym)
                if name is None:  # non-printable (Shift_L, space, Escape)
                    for cand in ("Shift_L", "space", "Escape"):
                        if keysym == XK.string_to_keysym(cand):
                            name = cand
                            break
                if name is not None:
                    out.append(("key", name.lower(),
                                ev.type == X.KeyPress))
            elif ev.type in (X.ButtonPress, X.ButtonRelease):
                out.append(("button", ev.detail,
                            ev.type == X.ButtonPress))
        return out

    def query_pointer(self) -> Tuple[int, int]:
        ptr = self.win.query_pointer()
        return (ptr.win_x, ptr.win_y)

    def blit(self, frame: np.ndarray):
        """frame: [H, W, 3] uint8 RGB -> chunked XPutImage
        (reference _draw_frame, game_cv.py:137-157; packing fixed to the
        standard X true-color 0x00RRGGBB pixel value — the reference's
        byte order displays with R/B swapped on standard visuals)."""
        X = self._X
        f = frame.astype(np.uint32)
        packed = (f[:, :, 0] << 16) | (f[:, :, 1] << 8) | f[:, :, 2]
        data = packed.astype("<u4").tobytes()
        stride = self.width * 4
        chunk_rows = 64
        for y in range(0, self.height, chunk_rows):
            h = min(chunk_rows, self.height - y)
            off = y * stride
            self.win.put_image(self.gc, 0, y, self.width, h,
                               X.ZPixmap, 24, 0,
                               data[off: off + h * stride])
        self.disp.flush()

    def close(self):
        self.disp.close()


def make_backend(width: int = 640, height: int = 360, headless=None):
    if headless is None:
        import os
        try:
            import Xlib.display  # noqa: F401
            headless = not bool(os.environ.get("DISPLAY"))
        except ImportError:
            headless = True
    if headless:
        return HeadlessBackend()
    return X11Backend(width, height)


class GameCV:
    """Input mapping + 60 FPS loop + stats (backend-agnostic)."""

    def __init__(self, pipeline, backend=None, fps: int = 60,
                 mouse_scale: float = 0.01, headless: Optional[bool] = None):
        self.pipeline = pipeline
        self.backend = backend or make_backend(headless=headless)
        self.fps = fps  # reference: game_cv.py:41 (60 FPS target)
        self.mouse_scale = mouse_scale
        self.button_state = np.zeros(len(KEYBINDS), dtype=bool)
        self.last_mouse_pos: Optional[Tuple[int, int]] = None
        self.running = True

    # ------------------------------------------------------------ events
    def handle_event(self, ev: tuple):
        kind = ev[0]
        if kind == "close":
            self.running = False
        elif kind == "key":
            _, name, pressed = ev
            if pressed and name in ("escape", "q"):
                self.running = False
                return
            if pressed:  # pipeline control keys (reference _handle_key)
                if name == "y" and hasattr(self.pipeline, "init_buffers"):
                    self.pipeline.init_buffers()
                elif name == "u" and hasattr(self.pipeline,
                                             "restart_from_buffer"):
                    self.pipeline.restart_from_buffer()
                elif name == "o" and hasattr(self.pipeline,
                                             "up_sampling_steps"):
                    self.pipeline.up_sampling_steps()
                elif name == "i" and hasattr(self.pipeline,
                                             "down_sampling_steps"):
                    self.pipeline.down_sampling_steps()
            if name in KEYMAP:
                self.button_state[KEYMAP[name]] = pressed
        elif kind == "button":
            _, n, pressed = ev
            if n in BUTTONMAP:
                self.button_state[BUTTONMAP[n]] = pressed

    def poll_events(self):
        for ev in self.backend.poll_events():
            self.handle_event(ev)

    def mouse_delta(self) -> np.ndarray:
        """Pointer delta scaled + clamped to [-1, 1]
        (reference _mouse_delta, game_cv.py:111-124)."""
        pos = self.backend.query_pointer()
        if self.last_mouse_pos is None:
            self.last_mouse_pos = pos
            return np.zeros(2, dtype=np.float32)
        dx = (pos[0] - self.last_mouse_pos[0]) * self.mouse_scale
        dy = (pos[1] - self.last_mouse_pos[1]) * self.mouse_scale
        self.last_mouse_pos = pos
        return np.clip(np.asarray([dx, dy], np.float32), -1.0, 1.0)

    # -------------------------------------------------------------- loop
    def run(self, max_ticks: Optional[int] = None) -> int:
        frame_budget = 1.0 / self.fps
        tick = 0
        stats_t0 = time.perf_counter()
        frames_in_sec = 0
        model_times = []

        while self.running and (max_ticks is None or tick < max_ticks):
            t_start = time.perf_counter()
            self.poll_events()
            if not self.running:
                break
            mouse = self.mouse_delta()

            out = self.pipeline(mouse, self.button_state.astype(np.float32))
            frame, _audio, model_time = out
            model_times.append(model_time)
            if frame is not None:
                self.backend.blit(np.asarray(frame))

            tick += 1
            frames_in_sec += 1
            now = time.perf_counter()
            if now - stats_t0 >= 1.0:
                p50 = float(np.median(model_times)) if model_times else 0.0
                steps = getattr(self.pipeline, "sampling_steps", None)
                print(f"fps={frames_in_sec} model_p50={p50 * 1e3:.1f}ms"
                      + (f" steps={steps}" if steps is not None else ""),
                      flush=True)
                stats_t0, frames_in_sec, model_times = now, 0, []

            remaining = frame_budget - (now - t_start)
            if remaining > 0:
                time.sleep(remaining)
        self.backend.close()
        return tick


def main():
    """Runnable interactive loop (reference inference/game_cv.py
    __main__): builds the model from a config YAML (+ optional
    checkpoint; random init for smoke runs), wraps it in a serve
    pipeline, and runs the 60 FPS event loop — X11 when a display is
    available, headless stats otherwise."""
    import argparse
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--ckpt_path", default=None)
    parser.add_argument("--pipeline", default="cached",
                        choices=["cached", "av_cached", "window"])
    parser.add_argument("--steps", type=int, default=2)
    parser.add_argument("--window_frames", type=int, default=120)
    parser.add_argument("--fps", type=int, default=60)
    parser.add_argument("--ticks", type=int, default=None,
                        help="stop after N ticks (default: run until quit)")
    parser.add_argument("--headless", action="store_true")
    parser.add_argument("--vae", default=None,
                        choices=[None, "dcae", "pixel_shuffle"],
                        help="decode frames to pixels through this video "
                             "VAE (reference uses dcae, "
                             "owl_vae_bridge.py:21-25)")
    parser.add_argument("--vae_ckpt", default=None,
                        help="torch state_dict for the video VAE decoder")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from owl_audio_exps_tpu import from_pretrained
    from owl_audio_exps_tpu.models import get_core_cls
    from pipeline import (AVCachedStreamingPipeline, CachedStreamingPipeline,
                          CausvidPipeline)

    cfg, params = from_pretrained(args.config_path, args.ckpt_path)
    m = cfg.model
    core = get_core_cls(m.model_id)(m, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    n_ctx = 8
    ctx = jnp.asarray(
        rs.randn(1, n_ctx, m.channels, m.sample_size, m.sample_size),
        jnp.bfloat16)
    t0 = jnp.zeros((1, n_ctx), jnp.bfloat16)
    mouse = jnp.zeros((1, n_ctx, 2), jnp.bfloat16)
    btn = jnp.zeros((1, n_ctx, m.n_buttons), jnp.bfloat16)
    has_audio = m.model_id in ("game_rft_audio", "game_mft_audio")
    aud = (jnp.asarray(rs.randn(1, n_ctx, m.audio_channels), jnp.bfloat16)
           if has_audio else None)
    if params is None:
        print("no checkpoint: random-init smoke run")
        init_args = (ctx, aud, t0, mouse, btn) if has_audio else \
            (ctx, t0, mouse, btn)
        params = core.init(jax.random.key(0), *init_args)
    elif "params" not in params:
        params = {"params": params}

    frame_decode_fn = None
    if args.vae:
        from owl_audio_exps_tpu.utils.owl_vae_bridge import (
            get_decoder_only, make_batched_decode_fn)
        dec = get_decoder_only(args.vae, ckpt_path=args.vae_ckpt,
                               latent_channels=m.channels)
        frame_decode_fn = make_batched_decode_fn(dec, batch_size=1)

    kind = args.pipeline
    if kind == "av_cached" or (kind == "cached" and has_audio):
        pipe = AVCachedStreamingPipeline(
            core, params, m, window_frames=args.window_frames,
            sampling_steps=args.steps, frame_decode_fn=frame_decode_fn)
        pipe.prime(ctx, aud, mouse, btn)
    elif kind == "cached":
        pipe = CachedStreamingPipeline(
            core, params, m, window_frames=args.window_frames,
            sampling_steps=args.steps, frame_decode_fn=frame_decode_fn)
        pipe.prime(ctx, mouse, btn)
    else:
        pipe = CausvidPipeline(core, params, m, window_length=60,
                               sampling_steps=args.steps,
                               frame_decode_fn=frame_decode_fn)

    loop = GameCV(pipe, fps=args.fps,
                  headless=True if args.headless else None)
    loop.run(max_ticks=args.ticks)


if __name__ == "__main__":
    main()
