from .mesh import make_mesh, shard_columns, shard_rows, replicate, ROW_AXIS

__all__ = ["make_mesh", "shard_columns", "shard_rows", "replicate",
           "ROW_AXIS"]
