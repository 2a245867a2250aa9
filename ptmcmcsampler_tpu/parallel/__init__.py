from .mesh import make_temp_mesh, shard_state, state_sharding  # noqa: F401
