"""gen3c_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the GEN3C system.

GEN3C (reference: nv-tlabs/GEN3C, built on NVIDIA Cosmos-Predict1) is a
3D-informed, camera-controllable video generation system:

  * a 3D cache of unprojected point clouds, forward-splatted into warped
    RGB + mask condition buffers for each target camera pose
    (``gen3c_tpu.cache``, ``gen3c_tpu.ops.geometry``),
  * a 7B video diffusion transformer (GeneralDIT) conditioned on those
    buffers, text embeddings and the seed-frame latent
    (``gen3c_tpu.models.dit``),
  * a causal 3D-conv video VAE tokenizer (CV8x8x8)
    (``gen3c_tpu.models.vae``),
  * an EDM-Euler sampling loop with conditioned-region replacement
    (``gen3c_tpu.diffusion``),
  * autoregressive 121*N-1 frame chaining and camera trajectory tools
    (``gen3c_tpu.pipelines``, ``gen3c_tpu.ops.camera``).

Everything is designed TPU-first: functional modules over parameter
pytrees, jit-compiled sampling, sharding via ``jax.sharding.Mesh`` +
NamedSharding (context/tensor/data parallel), and Pallas kernels for the
hot ops.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports (avoid importing jax at package import)."""
    lazy = {
        "Cache3DBuffer": "gen3c_tpu.cache",
        "Cache3DBufferSelector": "gen3c_tpu.cache",
        "Cache4D": "gen3c_tpu.cache",
        "Gen3CModel": "gen3c_tpu.models.gen3c",
        "Gen3cPipeline": "gen3c_tpu.pipelines.gen3c_pipeline",
        "build_gen3c_model": "gen3c_tpu.pipelines.factory",
        "generate_camera_trajectory": "gen3c_tpu.ops.camera",
        "VideoTokenizer": "gen3c_tpu.models.vae",
        "DiTConfig": "gen3c_tpu.models.dit",
        "EDMEulerSchedule": "gen3c_tpu.diffusion.scheduler",
        "make_mesh": "gen3c_tpu.parallel.mesh",
    }
    if name in lazy:
        import importlib

        return getattr(importlib.import_module(lazy[name]), name)
    raise AttributeError(f"module 'gen3c_tpu' has no attribute {name!r}")
