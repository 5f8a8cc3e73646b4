from .mesh import data_mesh_for_batch, make_mesh, shard_batch, replicate  # noqa: F401
