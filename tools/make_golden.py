"""Generate the golden regression snapshots (tests/test_golden.py).

Run ONLY after an intended physics change, on CPU:
    python tools/make_golden.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    import test_golden as tg

    os.makedirs(tg.GOLDEN_DIR, exist_ok=True)
    for name in sorted(tg.CASES):
        sig = tg.signature(name)
        path = os.path.join(tg.GOLDEN_DIR, f"{name}.npz")
        np.savez(path, **sig)
        print(f"{name}: hist={np.round(sig['hist'], 4).tolist()}")
        print(f"  stokes={sig['stokes']}, scalars={sig['scalars']}")
        print(f"  -> {path}")


if __name__ == "__main__":
    main()
