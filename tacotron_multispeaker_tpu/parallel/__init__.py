from .mesh import (batch_sharding, batch_spec, make_mesh, param_specs,  # noqa: F401
                   replicated)
from .distributed import initialize_distributed, is_primary_host  # noqa: F401
