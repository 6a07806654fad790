"""Load reference (torch CPU) modules from /root/reference as test oracles.

The reference geometry engine is pure torch and runs on CPU; we use it to
golden-test the JAX implementation. ``warp`` (NVIDIA Warp) is stubbed since
the reference only needs it lazily for the CUDA ray tracer.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def load_reference_geometry():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "warp" not in sys.modules:
        sys.modules["warp"] = types.ModuleType("warp")
    from cosmos_predict1.diffusion.inference import (  # noqa: E501
        camera_utils,
        forward_warp_utils_pytorch,
    )
    from cosmos_predict1.diffusion.inference import cache_3d

    return forward_warp_utils_pytorch, camera_utils, cache_3d
