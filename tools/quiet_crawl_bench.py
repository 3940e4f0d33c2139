"""Quiet-gated one-shot crawl-headline bench — the round-5 sink A/B.

The r4 verdict flagged the sf0.1 drain's sink stage as `weak-pending`:
76.5s (r3 driver) vs 116.9s (r4 driver, probe spikes recorded) vs ~37s
implied by a quiet session-1 run — with no quiet same-code measurement on
record. This tool waits for a genuinely quiet window (the scaling_watch
launch discipline: consecutive single-thread probes at the ~0.95 quiet
mark), then runs `python bench.py --crawl-only` once with mid-run probe
witnesses, and records everything to BENCH/sink_ab_r5.json. Defers to the
watcher/foreground protocol via BENCH/.busy + BENCH/.study_inflight.

Run detached:  nohup python tools/quiet_crawl_bench.py > BENCH/sink_ab_r5.out 2>&1 &
"""

from __future__ import annotations

import json
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
BENCH = REPO / "BENCH"
OUT = BENCH / "sink_ab_r5.json"

POLL_SEC = 90
QUIET_LAUNCH = 2
LAUNCH_MAX = 1.05
MIDRUN_SEC = 60
MAX_WALL_SEC = 4 * 3600


def probe() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i & 1023
    return round(time.perf_counter() - t0, 3)


def main() -> int:
    t_start = time.time()
    quiet = 0
    while time.time() - t_start < MAX_WALL_SEC:
        if (BENCH / ".busy").exists() or (BENCH / ".study_inflight").exists():
            quiet = 0
            time.sleep(POLL_SEC)
            continue
        p = probe()
        print(f"{time.strftime('%H:%M:%S')} poll probe {p}", flush=True)
        quiet = quiet + 1 if p <= LAUNCH_MAX else 0
        if quiet < QUIET_LAUNCH:
            time.sleep(POLL_SEC)
            continue
        # fire
        (BENCH / ".study_inflight").touch()
        mid: list[float] = []
        stop = threading.Event()

        def _mon():
            while not stop.is_set():
                mid.append(probe())
                stop.wait(MIDRUN_SEC)

        th = threading.Thread(target=_mon, daemon=True)
        th.start()
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, str(REPO / "bench.py"), "--crawl-only"],
                capture_output=True, text=True, timeout=3600,
                cwd=str(REPO))
        finally:
            stop.set()
            th.join(timeout=5)
            (BENCH / ".study_inflight").unlink(missing_ok=True)
        wall = round(time.time() - t0, 1)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")), None)
        rec = {"launch_probe": p, "midrun_probes": mid, "wall": wall,
               "returncode": r.returncode,
               "result": json.loads(line) if line else None,
               "stderr_tail": r.stderr[-2000:] if r.returncode else ""}
        OUT.write_text(json.dumps(rec, indent=1))
        print(f"done: wall {wall}s midrun {mid} -> {OUT}", flush=True)
        return 0
    print("no quiet window inside the wall budget", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
