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
from exploring_flash_attention_tpu.models.seq2seq import (
    Seq2SeqConfig,
    init_seq2seq_params,
    make_seq2seq_train_step,
    seq2seq_forward,
    seq2seq_loss,
)
from exploring_flash_attention_tpu.models.speculative import (
    SpeculativeEngine,
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
    "Seq2SeqConfig",
    "init_seq2seq_params",
    "seq2seq_forward",
    "seq2seq_loss",
    "make_seq2seq_train_step",
    "SpeculativeEngine",
]
