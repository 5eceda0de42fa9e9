"""Regenerate every validation artifact with one command.

Runs, in order, each study that backs the claims in validation/ and the
README (all on the real chip; total ~30-60 min depending on remote-compile
luck):

  1. RD validation + classical anchors + BD report   -> validation/*.csv
  2. Substitute-driven anchor harnesses (JXL/BDR/DLPR) -> validation/*.csv
  3. Training-recipe study                            -> validation/RECIPE.md
  4. Ablation matrix (reference experiment groups)    -> validation/ablations/
  5. Scale check incl. flagship Gaofen shapes         -> stdout table
  6. The headline benchmark                           -> stdout JSON line

Each step is an existing script run as a subprocess (fresh process = fresh
chip claim; a crash in one study doesn't take down the rest).  Pass
--only STEP[,STEP] to run a subset; --skip-flagship drops the two
slowest scale rows.

Usage: python scripts/repro_all.py [--only rd,recipe] [--skip-flagship]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEPS = {
    "rd": [sys.executable, "scripts/rd_validation.py"],
    "anchors": [sys.executable, "scripts/substitute_anchors.py"],
    "recipe": [sys.executable, "scripts/recipe_study.py"],
    "ablations": [sys.executable, "scripts/ablations.py"],
    # network/split groups at representative scale (validation/ABLATION_SCALE.md)
    "ablations1024": [
        sys.executable, "scripts/ablations.py", "--size", "1024",
        "--scenes", "2", "--groups", "network", "split",
        "--out", "validation/ablations_1024",
    ],
    "ablations2048": [
        sys.executable, "scripts/ablations.py", "--size", "2048",
        "--scenes", "1", "--groups", "network",
        "--out", "validation/ablations_2048",
    ],
    "scale": [sys.executable, "scripts/scale_check.py", "--flagship"],
    # cross-image dataset throughput A/B (VALIDATION.md dataset table)
    "dataset": [
        sys.executable, "scripts/scale_check.py", "--dataset", "4",
        "--sizes", "2048", "--channels", "4", "--K", "3", "4", "5", "6",
    ],
    "bench": [sys.executable, "bench.py"],
}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--only", type=str, default=None,
                   help="comma-separated subset of: " + ",".join(STEPS))
    p.add_argument("--skip-flagship", action="store_true")
    args = p.parse_args()

    wanted = list(STEPS) if not args.only else args.only.split(",")
    unknown = [w for w in wanted if w not in STEPS]
    if unknown:
        raise SystemExit(f"unknown steps {unknown}; have {list(STEPS)}")

    failures = []
    for name in wanted:
        cmd = list(STEPS[name])
        if name == "scale" and args.skip_flagship:
            cmd = cmd[:-1]  # default sizes instead of --flagship
        print(f"\n=== [{name}] {' '.join(cmd)}", flush=True)
        t0 = time.time()
        rc = subprocess.run(cmd, cwd=REPO).returncode
        print(f"=== [{name}] rc={rc} in {time.time()-t0:.0f}s", flush=True)
        if rc != 0:
            failures.append(name)
    if failures:
        print(f"FAILED steps: {failures}", file=sys.stderr)
        return 1
    print("\nall validation artifacts regenerated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
