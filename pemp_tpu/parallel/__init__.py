from pemp_tpu.parallel.mesh import data_mesh, batch_sharding, replicate
from pemp_tpu.parallel.step import make_train_step

__all__ = ["data_mesh", "batch_sharding", "replicate", "make_train_step"]
