from flashattention_tpu.models.transformer import (
    ModelConfig,
    decode_step,
    init_params,
    prefill,
    prefill_chunk,
)
