"""Create data/sample.tif — a stand-in for the reference's LFS-absent
README smoke input (the 2048x2048 GF-2 crop, reference visu_image.py:38).

Synthesizes a statistically similar 2048x2048x4-band 12-bit scene so every
README command is runnable as written.

Usage: python scripts/make_sample.py [--size 2048] [--out data/sample.tif]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=2048)
    p.add_argument("--out", type=str, default="data/sample.tif")
    args = p.parse_args()

    from lbdrn_msic_tpu.io.tiff import write_tiff
    from lbdrn_msic_tpu.utils.synth import synth_scene

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    img = synth_scene(args.size, args.size, channels=4, effective_bits=12, seed=42)
    write_tiff(args.out, img)
    print(f"wrote {args.out}: {img.shape} uint16 (12-bit effective)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
