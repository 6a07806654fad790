from gen3c_tpu.cache.cache3d import Cache3DBuffer, Cache3DBufferSelector, Cache4D

__all__ = ["Cache3DBuffer", "Cache3DBufferSelector", "Cache4D"]
