from gen3c_tpu.parallel.mesh import make_mesh

__all__ = ["make_mesh"]
