from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops,
    roofline_attention_tflops,
    time_fn_chained,
)

__all__ = ["time_fn_chained", "attention_flops", "roofline_attention_tflops"]
