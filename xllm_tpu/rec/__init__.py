"""Generative recommendation stack (OneRec-class).

TPU-native counterpart of the reference's rec subsystem:
- model: xllm/models/rec/onerec.h (T5-style encoder-decoder) → model.py
- vocab trie / constrained decoding:
  framework/state_dict/rec_vocab_dict.h + sampling/rec_constrained_decoding.h
  → vocab.py (in-graph mask generation)
- fixed-steps beam search: runtime/rec_worker_impl.cpp +
  scheduler/fixed_steps_scheduler.h → engine.py (one jitted scan)
"""

from xllm_tpu.rec.engine import RecEngine, RecRequest
from xllm_tpu.rec.model import OneRecConfig, OneRecModel
from xllm_tpu.rec.vocab import RecVocab

__all__ = ["RecEngine", "RecRequest", "OneRecConfig", "OneRecModel",
           "RecVocab"]
