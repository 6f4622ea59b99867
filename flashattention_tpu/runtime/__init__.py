from flashattention_tpu.runtime.engine import Engine, EngineConfig, Request
from flashattention_tpu.runtime.kvcache import CacheConfig, PagedKVCache
from flashattention_tpu.runtime.native import PageAllocator, Scheduler
