from .mesh import MeshConfig, make_mesh, get_mesh, batch_sharding  # noqa: F401
from .sharding import param_shardings, shard_params  # noqa: F401
from .dist import init_distributed, process_count, process_index  # noqa: F401
