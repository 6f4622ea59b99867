from flashattention_tpu.parallel.ring import (
    make_ring_attention,
    make_ring_attention_vjp,
    make_zigzag_ring_attention,
    make_zigzag_ring_attention_vjp,
    merge_partials,
    ring_attention_local,
    zigzag_shard,
    zigzag_unshard,
)
from flashattention_tpu.parallel.serving import (
    make_sharded_decode_step,
    make_sharded_paged_attention,
)
from flashattention_tpu.parallel.sharded import (
    make_allgather_cp_attention,
    make_data_parallel_attention,
    make_reduce_cp_attention,
    make_ulysses_attention,
    make_ulysses_attention_vjp,
)
