from vlm_clip_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    create_mesh,
    data_sharding,
    replicated,
    with_mesh,
)
from vlm_clip_tpu.parallel.sharding import (  # noqa: F401
    clip_param_rules,
    shard_params,
    spec_for_path,
)
