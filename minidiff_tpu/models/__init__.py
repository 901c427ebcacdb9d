"""Model zoo and NN building blocks driven by the minidiff_tpu engine.

The reference has no models layer (SURVEY.md §1: no L6); this package exists
for BASELINE config 2 — an MLP classifier trained end-to-end by the
framework's own backward pass — and as the flagship model for benchmarks and
the multi-chip dry run.
"""

from minidiff_tpu.models import functional  # noqa: F401
from minidiff_tpu.models.layers import Linear, Module, Sequential  # noqa: F401
from minidiff_tpu.models.mlp import MLP, make_train_step  # noqa: F401
from minidiff_tpu.models.optim import (  # noqa: F401
    EMA,
    SGD,
    Adafactor,
    Adam8bit,
    Adam,
    AdamW,
    Lion,
    MixedPrecision,
    Muon,
    Optimizer,
    clip_by_global_norm,
    cosine_schedule,
    warmup_linear_schedule,
)
from minidiff_tpu.models.data import synthetic_classification, mnist_like_batches  # noqa: F401
from minidiff_tpu.models.transformer import (  # noqa: F401
    LayerNorm,
    RMSNorm,
    MultiHeadAttention,
    TransformerBlock,
    TransformerLM,
    lm_loss,
    perplexity,
    synthetic_lm_batches,
)
from minidiff_tpu.models.transformer import (  # noqa: F401
    apply_step,
    generate,
    generate_cached,
    init_kv_cache,
)
from minidiff_tpu.models.decode import generate_compiled  # noqa: F401
from minidiff_tpu.models.beam import beam_search  # noqa: F401
from minidiff_tpu.models.seq2seq import (  # noqa: F401
    CrossAttention,
    Seq2SeqTransformer,
    greedy_decode,
    seq2seq_loss,
)
from minidiff_tpu.models.cnn import CNN, Conv2d  # noqa: F401
from minidiff_tpu.models.moe import (  # noqa: F401
    MoEFeedForward,
    MoETransformerBlock,
    MoETransformerLM,
    make_moe_loss,
)
from minidiff_tpu.models.rnn import (  # noqa: F401
    GRUCell,
    GRUClassifier,
    synthetic_sequence_classification,
)
from minidiff_tpu.models.lora import (  # noqa: F401
    combine_params,
    lora_init,
    lora_predicate,
    merge_lora,
    partition_params,
    trainable_params,
)
from minidiff_tpu.models.distill import (  # noqa: F401
    kd_loss,
    log_softmax,
    make_distill_step,
)
from minidiff_tpu.models.paged import PagedDecodeServer  # noqa: F401
from minidiff_tpu.models.pack import (  # noqa: F401
    make_packed_train_step,
    pack_documents,
    segment_positions,
)
from minidiff_tpu.models.server import (  # noqa: F401
    DecodeServer,
    SpeculativeDecodeServer,
    SSMDecodeServer,
)
from minidiff_tpu.models.unet import UNet2D  # noqa: F401
from minidiff_tpu.models.ssm import (  # noqa: F401
    MambaBlock,
    MambaLM,
    generate_compiled_ssm,
)
from minidiff_tpu.models.quant import (  # noqa: F401
    quantize_for_serving,
    quantized_bytes,
)
from minidiff_tpu.models.vit import ViT, patchify  # noqa: F401
from minidiff_tpu.models.dit import (DiT, flow_matching_loss,  # noqa: F401
                                     sample_flow, timestep_embedding,
                                     unpatchify)
from minidiff_tpu.models.speculative import (  # noqa: F401
    generate_speculative,
    generate_speculative_compiled,
)
