"""(Re)generate the fixed-seed golden images under tests/goldens/.

Run on the CPU backend (the test suite's platform):
    env JAX_PLATFORMS=cpu PYTHONPATH= python scripts/make_goldens.py
Regenerate ONLY when a shading change is intentional; commit the npz.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from golden_common import (GOLDEN_DIR, GOLDEN_NAMES, golden_path,  # noqa: E402
                           render_golden)


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in GOLDEN_NAMES:
        img = render_golden(name)
        assert np.isfinite(img).all(), name
        np.savez_compressed(golden_path(name), img=img.astype(np.float32))
        print(f"{name}: mean {img.mean():.5f} max {img.max():.3f} "
              f"-> {golden_path(name)}")


if __name__ == "__main__":
    main()
