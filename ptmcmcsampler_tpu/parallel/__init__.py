from .distributed import (  # noqa: F401
    initialize_distributed,
    make_pt_mesh,
    process_local_block,
)
from .mesh import make_temp_mesh, shard_state, state_sharding  # noqa: F401
