"""Splash block-size sweep for training MFU (VERDICT round-1 weak #5).

Runs scripts/tpu_train_bench.py in a subprocess per block config (the
splash kernel memo is per-process; env must be set before the first
trace) and tabulates s/step. Default workload: dit_v4 at 1024 frames
(65,536 tokens), Muon — the PERF.md headline row.

Usage: python scripts/tpu_splash_sweep.py [n_frames] [opt]
"""
import os
import re
import subprocess
import sys
import pathlib

ROOT = pathlib.Path(__file__).resolve().parents[1]
N_FRAMES = sys.argv[1] if len(sys.argv) > 1 else "1024"
OPT = sys.argv[2] if len(sys.argv) > 2 else "muon"

BASE_ENV = {
    "OWL_SCAN_LAYERS": "1", "OWL_MUON_BF16": "1", "OWL_GRADS_BF16": "1",
    "OWL_SPLASH_HEAD_CHUNKS": "4", "OWL_MLP_CHUNKS": "8",
}

# (label, env overrides). 65,536 = 2^16 so every 128-multiple power of
# two divides it; window layers see kv = q = full length.
CONFIGS = [
    ("default(512/512)", {}),
    ("bwd256", {"OWL_SPLASH_BQ_BWD": "256", "OWL_SPLASH_BKV_BWD": "256"}),
    ("bwd128", {"OWL_SPLASH_BQ_BWD": "128", "OWL_SPLASH_BKV_BWD": "128"}),
    ("bwd_q256_kv512", {"OWL_SPLASH_BQ_BWD": "256"}),
    ("bwd_q512_kv256", {"OWL_SPLASH_BKV_BWD": "256"}),
    ("fwd256", {"OWL_SPLASH_BQ": "256", "OWL_SPLASH_BKV": "256"}),
    ("fwd256_bwd256", {"OWL_SPLASH_BQ": "256", "OWL_SPLASH_BKV": "256",
                       "OWL_SPLASH_BQ_BWD": "256",
                       "OWL_SPLASH_BKV_BWD": "256"}),
]

results = []
for label, extra in CONFIGS:
    env = dict(os.environ, **BASE_ENV, **extra)
    proc = subprocess.run(
        [sys.executable, str(ROOT / "scripts/tpu_train_bench.py"),
         N_FRAMES, "1", OPT],
        env=env, capture_output=True, text=True, timeout=1500)
    m = re.search(r"frames=\d+ batch=\d+: ([\d.]+) s/step.*MFU=([\d.]+)%",
                  proc.stdout)
    if m:
        results.append((label, float(m.group(1)), float(m.group(2))))
        print("%-20s %.3f s/step  MFU=%.1f%%" % (
            label, float(m.group(1)), float(m.group(2))), flush=True)
    else:
        tail = (proc.stdout + proc.stderr).strip().splitlines()[-3:]
        print("%-20s FAILED rc=%d: %s" % (label, proc.returncode,
                                          " | ".join(tail)), flush=True)

if results:
    best = min(results, key=lambda r: r[1])
    print("\nBEST: %s  %.3f s/step  MFU=%.1f%%" % best)
