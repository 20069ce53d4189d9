"""Golden-trajectory regression (SURVEY.md §4: golden-file strategy).

Locks the full-pipeline numerics on a fixed synthetic sequence: any
change that silently shifts registration/segmentation behavior beyond
noise shows up as a diff against the stored trajectory. Regenerate with
tools/regen_golden.py when a change is *intentional*. The scene itself
lives in golden_scenes.py (shared with the regen tool and the spherical
variant in test_spherical.py).
"""

import os

import numpy as np

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "linear_32x512_seed7.npz"
)


def test_golden_trajectory():
    from golden_scenes import golden_trajectory

    got = golden_trajectory(organized=True)
    want = np.load(GOLDEN)["poses"]
    # small fp wiggle allowed (XLA version / fusion changes); anything
    # larger is a behavioral shift that needs a deliberate regen
    np.testing.assert_allclose(got, want, atol=5e-3)
