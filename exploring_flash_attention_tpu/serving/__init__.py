from exploring_flash_attention_tpu.serving.kv_cache import (
    PagedKVCache,
    PageAllocator,
    append_tokens,
    gather_kv,
    make_cache,
)
from exploring_flash_attention_tpu.serving.decode import (
    paged_decode_attention,
    paged_extend_attention,
)
from exploring_flash_attention_tpu.serving.scheduler import (
    ContinuousBatchingScheduler,
    Request,
)

__all__ = [
    "PagedKVCache",
    "PageAllocator",
    "make_cache",
    "append_tokens",
    "gather_kv",
    "paged_decode_attention",
    "paged_extend_attention",
    "ContinuousBatchingScheduler",
    "Request",
]
