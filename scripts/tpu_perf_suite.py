"""Consolidated TPU perf suite: runs the core benchmarks serially and
writes PERF_AUTO.md (NOT PERF.md — that file is the hand-curated
measured ledger and must never be clobbered by an automated run).
Usage: python scripts/tpu_perf_suite.py
"""
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]

RUNS = [
    ("audio streaming RTF (bench.py)", [sys.executable, "bench.py"]),
    ("video stream dit_v4 2-step",
     [sys.executable, "scripts/tpu_video_stream_bench.py", "120", "16", "2"]),
    ("video stream dit_v4 1-step",
     [sys.executable, "scripts/tpu_video_stream_bench.py", "120", "16", "1"]),
    ("training step dit_v4 (256 frames)",
     [sys.executable, "scripts/tpu_train_bench.py", "256", "1"]),
    ("splash attention numerics",
     [sys.executable, "scripts/tpu_splash_check.py"]),
]


def main():
    lines = ["# PERF_AUTO — one-shot reproduction run "
             "(curated ledger: PERF.md)", ""]
    for name, cmd in RUNS:
        t0 = time.time()
        try:
            res = subprocess.run(cmd, cwd=ROOT, capture_output=True,
                                 text=True, timeout=2400)
            tail = [ln for ln in res.stdout.strip().splitlines()
                    if ln and "WARNING" not in ln][-3:]
            status = "ok" if res.returncode == 0 else f"rc={res.returncode}"
        except subprocess.TimeoutExpired:
            tail, status = ["<timeout>"], "timeout"
        lines.append(f"## {name} ({status}, {time.time() - t0:.0f}s)")
        lines.extend(["```", *tail, "```", ""])
        print(f"[{status}] {name}: {tail}")
    (ROOT / "PERF_AUTO.md").write_text("\n".join(lines))
    print("wrote PERF_AUTO.md")


if __name__ == "__main__":
    main()
