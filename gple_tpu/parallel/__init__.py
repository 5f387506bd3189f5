from gple_tpu.parallel.sharding import (
    make_mesh,
    make_step_fn,
    shard_density,
    sharded_step_fn,
)

__all__ = ["make_mesh", "make_step_fn", "shard_density", "sharded_step_fn"]
