"""audio8-tpu: TPU-native wav2vec 2.0 speech framework.

JAX/XLA/Pallas re-design of the mead-ml/audio8 capability surface:
contrastive pretraining, CTC fine-tuning + decoding, seq2seq ASR, and
paired audio<->text pretraining. See README.md and docs/PARITY.md.
"""

from audio8_tpu.version import __version__  # noqa: F401

from audio8_tpu import config
from audio8_tpu.utils import Average, Offsets, revlut, str2bool
