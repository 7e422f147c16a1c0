"""Device-mesh parallelism: mesh construction, sharding rules, collectives.

Replaces the reference's NCCL/accelerate stack (train_scripts/train.py:301-326,
diffusion/utils/dist_utils.py) with jax.sharding + GSPMD: data parallelism and
optional FSDP-style parameter sharding over ICI, multi-host over DCN via
jax.distributed.
"""

from pixart_sigma_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    build_mesh,
    data_sharding,
    param_sharding,
    replicated,
    seq_axis_size,
    seq_constraint,
)
from pixart_sigma_tpu.parallel.dist import (  # noqa: F401
    initialize_distributed,
    is_main_process,
    process_count,
    process_index,
)
