from nf_tpu.parallel.mesh import make_mesh, data_parallel_sharding

__all__ = ["make_mesh", "data_parallel_sharding"]
