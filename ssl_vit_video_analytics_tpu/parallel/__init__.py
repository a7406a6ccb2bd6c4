from .mesh import make_mesh, data_sharding, replicated, shard_batch
from .tp import shard_params_tp, count_sharded, tp_spec_for
from .sp import sp_attention_packed
from .pp import (pipeline_apply, pipeline_transformer_encoder,
                 stack_block_params, unstack_block_params)
