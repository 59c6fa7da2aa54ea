from .mesh import make_mesh, shard_columns, shard_rows, replicate, ROW_AXIS

__all__ = ["make_mesh", "shard_columns", "shard_rows", "replicate",
           "ROW_AXIS", "sharded_msm", "ShardedCachedMSM", "ShardedNTT",
           "sharded_prefix_product"]


def __getattr__(name):
    # lazy: shard_map modules import jax.experimental at use time
    if name in ("sharded_msm", "ShardedCachedMSM"):
        from . import msm as _m
        return getattr(_m, name)
    if name == "ShardedNTT":
        from .ntt import ShardedNTT
        return ShardedNTT
    if name == "sharded_prefix_product":
        from .scan import sharded_prefix_product
        return sharded_prefix_product
    raise AttributeError(name)
