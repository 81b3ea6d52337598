from audio8_tpu.models.wav2vec2 import (
    ConvFeatureExtractor,
    GumbelVectorQuantizer,
    AudioTransformerEncoder,
    Wav2Vec2Encoder,
    Wav2Vec2AcousticModel,
    Wav2Vec2PooledEncoder,
    Wav2Vec2Model,
    wav2vec2_pretrain_loss,
    sample_negative_indices,
    create_model,
    create_acoustic_model,
)
