from diff_vits_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from diff_vits_tpu.parallel.activations import (
    sequence_parallel,
    enable_sequence_parallel,
    disable_sequence_parallel,
    constrain_seq,
)
from diff_vits_tpu.parallel.pipeline import make_pipeline
