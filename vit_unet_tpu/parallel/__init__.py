from vit_unet_tpu.parallel.mesh import (
    create_mesh, create_hybrid_mesh, data_sharding, replicated,
    replica_count, initialize_distributed,
)
from vit_unet_tpu.parallel.partition import partition_specs, shard_tree, spec_for_path
from vit_unet_tpu.parallel.train_step import TrainState, build_step_functions
from vit_unet_tpu.parallel.sequence import sequence_parallel_reattention
