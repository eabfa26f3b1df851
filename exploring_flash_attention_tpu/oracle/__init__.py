from exploring_flash_attention_tpu.oracle.reference import (
    check_accuracy,
    naive_attention,
    naive_attention_jax,
    print_comparison,
)

__all__ = [
    "naive_attention",
    "naive_attention_jax",
    "check_accuracy",
    "print_comparison",
]
