"""Model zoo: classical (KNN) + neural (MLP/CNN/GPT/BERT/T5/ViT)."""

from np_modeling_tpu.models.bert import (BertConfig, BertEncoder,
                                         mlm_mask_tokens)
from np_modeling_tpu.models.cnn import CNNClassifier
from np_modeling_tpu.models.knn import (Algorithm, KNearestNeighbours,
                                        euclidean_distance)
from np_modeling_tpu.models.mlp import MLP
from np_modeling_tpu.models.beam import beam_search
from np_modeling_tpu.models.seq2seq import Seq2SeqConfig, Seq2SeqTransformer
from np_modeling_tpu.models.speculative import speculative_generate
from np_modeling_tpu.models.t5 import T5, T5Config
from np_modeling_tpu.models.clip import (CLIP, CLIPConfig,
                                          clip_contrastive_loss,
                                          siglip_loss)
from np_modeling_tpu.models.mamba import Mamba, MambaConfig
from np_modeling_tpu.models.mamba2 import Mamba2, Mamba2Config
from np_modeling_tpu.models.multimodal import LLaVA, LLaVAConfig
from np_modeling_tpu.models.transformer_lm import GPT, GPTConfig
from np_modeling_tpu.models.vit import ViT, ViTConfig, patchify
from np_modeling_tpu.models.audio import log_mel_spectrogram, mel_filter_bank
from np_modeling_tpu.models.whisper import Whisper, WhisperConfig

__all__ = [
    "Algorithm", "BertConfig", "BertEncoder", "CNNClassifier", "GPT",
    "GPTConfig", "KNearestNeighbours", "MLP", "Seq2SeqConfig",
    "Seq2SeqTransformer", "T5", "T5Config", "beam_search", "euclidean_distance",
    "CLIP", "CLIPConfig", "clip_contrastive_loss", "siglip_loss",
    "LLaVA", "LLaVAConfig", "Mamba", "MambaConfig", "Mamba2", "Mamba2Config",
    "mlm_mask_tokens", "speculative_generate", "ViT", "ViTConfig",
    "patchify", "Whisper", "WhisperConfig", "log_mel_spectrogram",
    "mel_filter_bank",
]
