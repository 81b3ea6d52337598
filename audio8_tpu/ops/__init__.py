from audio8_tpu.ops.masks import (
    sequence_mask,
    span_mask,
    num_spans,
    compact_mask_indices,
)
from audio8_tpu.ops.ctc import ctc_loss, ctc_greedy_decode
from audio8_tpu.ops.beam import PrefixBeamSearch
from audio8_tpu.ops.lm import ArpaLM
