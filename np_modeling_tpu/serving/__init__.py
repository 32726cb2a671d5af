"""Serving: paged KV-cache management, paged decode attention, engine,
tokenizer, and the text in/out layer."""

from np_modeling_tpu.serving.constrain import (TokenDFA, dfa_from_choices,
                                               dfa_from_json_schema,
                                               dfa_from_regex)
from np_modeling_tpu.serving.engine import GenerationEngine
from np_modeling_tpu.serving.kv_cache import PagedKVCache
from np_modeling_tpu.serving.sampling import SamplingParams
from np_modeling_tpu.serving.seq2seq_engine import Seq2SeqEngine
from np_modeling_tpu.serving.server import (CompletionScheduler,
                                            OpenAIServer)
from np_modeling_tpu.serving.ssm_engine import OutOfSlotsError, SSMEngine
from np_modeling_tpu.serving.text import Completion, StreamDecoder, TextEngine
from np_modeling_tpu.serving.tokenizer import BPETokenizer

__all__ = ["BPETokenizer", "Completion", "CompletionScheduler",
           "GenerationEngine", "OpenAIServer", "OutOfSlotsError",
           "PagedKVCache", "SamplingParams", "Seq2SeqEngine", "SSMEngine",
           "StreamDecoder", "TextEngine", "TokenDFA", "dfa_from_choices",
           "dfa_from_regex", "dfa_from_json_schema"]
