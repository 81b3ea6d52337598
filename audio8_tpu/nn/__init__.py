from audio8_tpu.nn.layers import (
    Dense,
    Conv1D,
    GroupNorm,
    LayerNorm,
    PositionalConv,
    gelu,
)
from audio8_tpu.nn.transformer import (
    MultiHeadAttention,
    TransformerEncoderLayer,
    TransformerEncoderStack,
    TransformerDecoderLayer,
    TransformerDecoderStack,
)
from audio8_tpu.nn.pooling import (
    MaxPool1D,
    MeanPool1D,
    SingleHeadReduction,
    TwoHeadConcat,
    make_reduction,
)
from audio8_tpu.nn.embeddings import (
    LookupTableEmbeddings,
    LearnedPositionalEmbeddings,
    WeightTieDense,
)
