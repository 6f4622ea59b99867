from flashattention_tpu.parallel.ring import (
    make_ring_attention,
    merge_partials,
    ring_attention_local,
)
from flashattention_tpu.parallel.sharded import (
    make_allgather_cp_attention,
    make_data_parallel_attention,
    make_reduce_cp_attention,
)
