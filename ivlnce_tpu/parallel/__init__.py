from ivlnce_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
from ivlnce_tpu.parallel.train import sharded_train_step

__all__ = [
    "make_mesh",
    "param_shardings",
    "batch_sharding",
    "replicated",
    "sharded_train_step",
]
