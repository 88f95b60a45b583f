from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    local_data_mesh,
    make_mesh,
    pad_batch_to_devices,
    replicate,
    replicated,
    shard_batch,
)
from . import multihost  # noqa: F401
from .hostmesh import cpu_mesh_xla_flags, ensure_cpu_mesh_flags  # noqa: F401
