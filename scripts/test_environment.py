"""Environment smoke check (scripts/test_environment.py parity:
import-checks the stack and reports versions/devices)."""

from __future__ import annotations

import sys


def main() -> int:
    ok = True
    print(f"python {sys.version.split()[0]}")
    if sys.version_info < (3, 10):
        print("ERROR: python >= 3.10 required")
        ok = False
    for name in ("jax", "flax", "optax", "orbax.checkpoint", "numpy",
                 "einops", "transformers", "PIL", "imageio"):
        try:
            mod = __import__(name)
            ver = getattr(mod, "__version__", "?")
            print(f"  {name:<18} {ver}")
        except ImportError as e:
            print(f"  {name:<18} MISSING ({e})")
            ok = False
    try:
        import jax

        print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
        import jax.numpy as jnp

        # the remote compile helper can transiently fail; retry
        for attempt in range(3):
            try:
                assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0
                print("device compute: OK")
                break
            except Exception as e:  # noqa: BLE001
                if attempt == 2:
                    raise
                print(f"  device compute attempt {attempt} failed: {e}")
                jax.clear_caches()
    except Exception as e:  # noqa: BLE001
        print(f"device compute FAILED: {e}")
        ok = False
    try:
        import gen3c_tpu  # noqa: F401
        from gen3c_tpu.pipelines.factory import PRESETS

        print(f"gen3c_tpu import OK; presets: {sorted(PRESETS)}")
    except Exception as e:  # noqa: BLE001
        print(f"gen3c_tpu import FAILED: {e}")
        ok = False
    print("environment OK" if ok else "environment has problems")
    return 0 if ok else 1


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    raise SystemExit(main())
