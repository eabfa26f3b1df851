from exploring_flash_attention_tpu.models.encoder import (
    make_mlm_train_step,
    mlm_loss,
)
from exploring_flash_attention_tpu.models.generate import (
    GenerationEngine,
    forward_collect_kv,
)
from exploring_flash_attention_tpu.models.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from exploring_flash_attention_tpu.models.transformer import (
    ModelConfig,
    forward,
    init_params,
    loss_fn,
    make_train_step,
)

__all__ = [
    "ModelConfig",
    "init_params",
    "forward",
    "loss_fn",
    "make_train_step",
    "make_mlm_train_step",
    "mlm_loss",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint",
    "GenerationEngine",
    "forward_collect_kv",
]
