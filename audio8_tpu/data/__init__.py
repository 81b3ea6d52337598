from audio8_tpu.data.audio import SoundfileAudioReader, AudioResampleReader, read_wav
from audio8_tpu.data.datasets import (
    AudioTextLetterDataset,
    AudioFileDataset,
    BucketingAudioDataset,
    batch_by_size,
    find_fit,
    PrefetchLoader,
)
