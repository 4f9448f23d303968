"""Opportunistic idle-box scaling-record capture.

The ≥0.8 raw scaling bar (BASELINE.json) is only measurable on this shared
box when the box itself can 4x a computation — `bench.py --hw-probe N`
measures that ceiling directly (pure-multiprocessing parse kernel, no Ray).
This watcher loops: probe the window's 4->16 ceiling; when it reads at or
above ``--ceiling`` (default 0.82), run a full ``bench.py --scaling`` and
save it as the next ``SCALING_r05_I{N}.json``; otherwise sleep and retry.

Coordination: skips a cycle while ``/tmp/abwcf_busy`` exists (another
process of ours is using the box); holds ``/tmp/abwcf_scaling_running``
during a full run so other work can wait on it.

Usage: python tools/scaling_watch.py [--ceiling 0.82] [--max-runs 3]
       [--interval 420] [--max-cycles 50]
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BUSY = Path("/tmp/abwcf_busy")
RUNNING = Path("/tmp/abwcf_scaling_running")


def probe(n: int) -> float | None:
    r = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--hw-probe", str(n)],
        capture_output=True, text=True, timeout=600,
    )
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    try:
        return float(lines[-1])
    except (IndexError, ValueError):
        return None


def next_artifact() -> Path:
    taken = [
        int(m.group(1))
        for p in REPO.glob("SCALING_r05_I*.json")
        if (m := re.match(r"SCALING_r05_I(\d+)\.json", p.name))
    ]
    return REPO / f"SCALING_r05_I{max(taken, default=0) + 1}.json"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ceiling", type=float, default=0.82)
    ap.add_argument("--max-runs", type=int, default=3)
    ap.add_argument("--interval", type=float, default=420.0)
    ap.add_argument("--max-cycles", type=int, default=50)
    args = ap.parse_args()

    captured = 0
    for cycle in range(args.max_cycles):
        if captured >= args.max_runs:
            break
        if BUSY.exists():
            print(f"[watch {cycle}] busy marker present, sleeping", flush=True)
            time.sleep(args.interval)
            continue
        p4 = probe(4)
        p16 = probe(16)
        if not p4 or not p16:
            print(f"[watch {cycle}] probe failed ({p4}, {p16})", flush=True)
            time.sleep(args.interval)
            continue
        ceil = min(1.0, p16 / p4)
        print(
            f"[watch {cycle}] percore 4={p4:.0f} 16={p16:.0f} ceiling={ceil:.3f}",
            flush=True,
        )
        if ceil < args.ceiling:
            time.sleep(args.interval)
            continue
        out = next_artifact()
        print(f"[watch {cycle}] window open -> full --scaling run ({out.name})",
              flush=True)
        RUNNING.touch()
        try:
            r = subprocess.run(
                [sys.executable, str(REPO / "bench.py"), "--scaling"],
                capture_output=True, text=True, timeout=3600, cwd=str(REPO),
            )
            lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
            rec = json.loads(lines[-1])
            out.write_text(json.dumps(rec, indent=1))
            captured += 1
            print(
                f"[watch {cycle}] {out.name}: raw={rec.get('scaling_efficiency')} "
                f"extract={rec.get('extract_scaling_efficiency')} "
                f"ceiling={rec.get('hw', {}).get('hw_ceiling')}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 - keep watching on any failure
            print(f"[watch {cycle}] scaling run failed: {e}", flush=True)
        finally:
            RUNNING.unlink(missing_ok=True)
    print(f"[watch] done, captured {captured} run(s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
