"""flashattention_tpu — a TPU-native flash-attention engine.

Brand-new JAX/Pallas implementation of the capabilities of
kilianhae/FlashAttention.C (see SURVEY.md for the component-by-component map),
generalized into a production attention stack: fused prefill/decode kernels,
quantized paged KV-cache, continuous batching, and mesh-parallel / ring
attention.
"""

from flashattention_tpu.ops.backward import attention_vjp, flash_attention_bwd
from flashattention_tpu.ops.decode import paged_attention, paged_prefill_attention
from flashattention_tpu.ops.dispatch import attention, sdpa
from flashattention_tpu.ops.flash import (
    BlockMask,
    BlockSizes,
    flash_attention,
    flash_attention_naive,
)
from flashattention_tpu.ops.quant import (
    QuantizedTensor,
    QuantizedWeight,
    attention_quantized,
    dequantize,
    dequantize_weight,
    quantize,
    quantize_kv,
    quantize_weight,
    quantize_weights,
)
from flashattention_tpu.ops.reference import (
    attention_reference,
    attention_reference_with_stats,
)

__version__ = "0.1.0"

__all__ = [
    "attention",
    "sdpa",
    "BlockSizes",
    "BlockMask",
    "flash_attention",
    "flash_attention_naive",
    "attention_vjp",
    "flash_attention_bwd",
    "paged_attention",
    "paged_prefill_attention",
    "QuantizedTensor",
    "attention_quantized",
    "quantize",
    "dequantize",
    "quantize_kv",
    "QuantizedWeight",
    "quantize_weight",
    "quantize_weights",
    "dequantize_weight",
    "attention_reference",
    "attention_reference_with_stats",
]
