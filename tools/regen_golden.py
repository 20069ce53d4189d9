"""Regenerate the golden regression trajectories (tests/golden/).

Run after an INTENTIONAL behavioral change:

    env PYTHONPATH=. JAX_PLATFORMS=cpu python tools/regen_golden.py [--only organized|spherical]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["organized", "spherical"], default=None)
    args = ap.parse_args()

    from golden_scenes import golden_trajectory

    gdir = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    jobs = {
        "organized": ("linear_32x512_seed7.npz", True),
        "spherical": ("spherical_32x512_seed7.npz", False),
    }
    for name, (fname, organized) in jobs.items():
        if args.only and name != args.only:
            continue
        poses = golden_trajectory(organized=organized)
        path = os.path.join(gdir, fname)
        np.savez(path, poses=poses)
        print(f"{name}: wrote {path}\n{poses}")


if __name__ == "__main__":
    main()
