from exploring_flash_attention_tpu.utils.autotune import (
    autotune_dtiled,
    autotune_splitkv,
    autotune_v1,
)
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops,
    roofline_attention_tflops,
    time_fn_chained,
)
from exploring_flash_attention_tpu.utils.profiling import (
    kernel_report,
    roofline_tflops,
    trace,
)

__all__ = [
    "autotune_dtiled",
    "autotune_splitkv",
    "autotune_v1",
    "time_fn_chained",
    "attention_flops",
    "roofline_attention_tflops",
    "kernel_report",
    "roofline_tflops",
    "trace",
]
