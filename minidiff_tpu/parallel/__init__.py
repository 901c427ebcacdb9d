from minidiff_tpu.parallel.mesh import (  # noqa: F401
    constrain,
    make_mesh,
    fsdp_sharding_rules,
    mamba_sharding_rules,
    mlp_sharding_rules,
    moe_sharding_rules,
    named_sharding,
    shard_tree,
    transformer_sharding_rules,
)
from minidiff_tpu.parallel.train import make_sharded_train_step  # noqa: F401
from minidiff_tpu.parallel.moe_ep import (  # noqa: F401
    make_moe_ep_train_step,
    moe_ep_ffn,
    moe_ep_param_specs,
)
from minidiff_tpu.parallel.pipeline import (  # noqa: F401
    make_pipeline_train_step,
    stack_stage_params,
    stack_stage_specs,
    unstack_stage_params,
)
from minidiff_tpu.parallel.ring import (  # noqa: F401
    make_ring_train_step,
    ring_attention,
    ring_attention_zigzag,
    zigzag_order,
)
