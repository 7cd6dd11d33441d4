from nf_tpu.parallel.mesh import make_mesh, data_parallel_sharding
from nf_tpu.parallel.dp import make_dp_loss, make_dp_train_step

__all__ = ["make_mesh", "data_parallel_sharding",
           "make_dp_loss", "make_dp_train_step"]
