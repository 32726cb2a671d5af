"""Op library: every op carries a hand-written VJP (jax.custom_vjp).

``jax.grad`` of anything built from these ops uses OUR manual gradients —
the TPU-native analogue of the reference framework's per-layer ``backward()``
methods, validated against autodiff in tests (same oracle strategy as the
reference, see /root/reference/README.md:11 and SURVEY.md §4).
"""

from np_modeling_tpu.ops import dispatch
from np_modeling_tpu.ops.ssm import (selective_scan,
                                     selective_scan_step, ssd,
                                     ssd_step)
from np_modeling_tpu.ops.activations import (ACTIVATIONS, gelu,
                                              gelu_exact,
                                             get_activation, quick_gelu,
                                             relu, silu, softmax)
from np_modeling_tpu.ops.attention import (DEFAULT_MASK_VALUE,
                                           attention_reference,
                                           flash_attention)
from np_modeling_tpu.ops.conv import conv2d, conv2d_transpose
from np_modeling_tpu.ops.embedding import embedding_lookup
from np_modeling_tpu.ops.fused import (dropout_prng, seed_from_key,
                                       softmax_cross_entropy_fused)
from np_modeling_tpu.ops.linear import linear
from np_modeling_tpu.ops.losses import (cross_entropy_probs,
                                        kl_divergence_from_logits,
                                        fused_lm_head_loss, mse,
                                        softmax_cross_entropy,
                                        softmax_cross_entropy_with_integer_labels)
from np_modeling_tpu.ops.matmul import matmul
from np_modeling_tpu.ops.metrics import (BinaryClassificationMetrics, accuracy,
                                         binary_classification_metrics,
                                         confusion_matrix, perplexity,
                                         top_k_accuracy)
from np_modeling_tpu.ops.normalization import (dropout, dropout_with_mask,
                                               layer_norm, make_dropout_mask,
                                               rms_norm)
from np_modeling_tpu.ops.paged_attention import (paged_attention,
                                                 paged_attention_reference)
from np_modeling_tpu.ops.quantization import (QuantizedTensor,
                                              dequantize_int8,
                                              dequantize_params,
                                              quantize_int8,
                                              quantize_int8_stochastic,
                                              quantize_params_int4,
                                              quantize_params_int8,
                                              int8_matmul)
from np_modeling_tpu.ops.rope import apply_rope

__all__ = [
    "ACTIVATIONS", "BinaryClassificationMetrics", "DEFAULT_MASK_VALUE",
    "accuracy", "attention_reference", "binary_classification_metrics",
    "confusion_matrix", "conv2d", "conv2d_transpose", "cross_entropy_probs",
    "dispatch", "dropout", "dropout_prng", "dropout_with_mask",
    "embedding_lookup", "flash_attention", "gelu", "seed_from_key",
    "softmax_cross_entropy_fused",
    "get_activation", "layer_norm", "linear", "make_dropout_mask", "matmul",
    "QuantizedTensor", "apply_rope", "dequantize_int8", "gelu_exact", "mse",
    "paged_attention",
    "paged_attention_reference", "quantize_int8", "quantize_int8_stochastic",
    "quantize_params_int4", "quantize_params_int8", "dequantize_params",
    "int8_matmul",
    "kl_divergence_from_logits",
    "quick_gelu", "relu", "rms_norm", "selective_scan",
    "selective_scan_step", "silu", "softmax", "ssd", "ssd_step",
    "softmax_cross_entropy",
    "softmax_cross_entropy_with_integer_labels",
]
