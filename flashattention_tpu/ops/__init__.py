from flashattention_tpu.ops.dispatch import attention, sdpa
from flashattention_tpu.ops.flash import (
    BlockMask,
    BlockSizes,
    flash_attention,
    flash_attention_naive,
)
from flashattention_tpu.ops.reference import (
    attention_reference,
    attention_reference_with_stats,
)
