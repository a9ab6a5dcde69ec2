from .mesh import make_mesh
from .sharding import shard_params, param_sharding_rules, batch_sharding
from .train import make_train_step, TrainState
from .inference import make_spatial_sharded_forward, make_tensor_sharded_forward

__all__ = [
    "make_mesh",
    "shard_params",
    "param_sharding_rules",
    "batch_sharding",
    "make_train_step",
    "TrainState",
    "make_spatial_sharded_forward",
    "make_tensor_sharded_forward",
]
