"""Training: pure-function optimizers, schedules, jitted train step, data
pipeline, checkpointing."""

from np_modeling_tpu.training import data, schedules
from np_modeling_tpu.training.distill import distill_gpt_loss, distill_loss
from np_modeling_tpu.training.dpo import (dpo_loss, gpt_dpo_loss,
                                          sequence_logprobs)
from np_modeling_tpu.training.grpo import (gpt_grpo_loss, group_advantages,
                                           grpo_loss, token_logprobs)
from np_modeling_tpu.training.lora import (ALL_LINEAR_TARGETS,
                                           ATTENTION_TARGETS, lora_finalize,
                                           lora_init, lora_merge)
from np_modeling_tpu.training.native_data import TokenFileLoader
from np_modeling_tpu.training.checkpoint import (
    load_checkpoint, load_checkpoint_sharded, save_checkpoint,
    save_checkpoint_sharded)
from np_modeling_tpu.training.optimizers import (AdamState, EmaState,
                                                 Optimizer, adafactor,
                                                 adam, adamw, apply_updates,
                                                 chain, clip_by_global_norm,
                                                 ema_params, lion, momentum,
                                                 muon, sgd, skip_nonfinite)
from np_modeling_tpu.training.trainer import (Trainer, make_eval_step,
                                              make_train_step, resolve_loss)

__all__ = [
    "AdamState", "EmaState", "Optimizer", "TokenFileLoader", "Trainer",
    "adafactor", "ema_params", "adam",
    "adamw", "apply_updates",
    "ALL_LINEAR_TARGETS", "ATTENTION_TARGETS", "lora_finalize", "lora_init",
    "lora_merge",
    "distill_gpt_loss", "distill_loss",
    "dpo_loss", "gpt_dpo_loss", "sequence_logprobs",
    "gpt_grpo_loss", "group_advantages", "grpo_loss", "token_logprobs",
    "chain", "clip_by_global_norm", "data", "load_checkpoint",
    "load_checkpoint_sharded", "save_checkpoint_sharded",
    "lion", "muon",
    "make_eval_step", "make_train_step", "momentum", "resolve_loss",
    "save_checkpoint", "schedules", "sgd", "skip_nonfinite",
]
