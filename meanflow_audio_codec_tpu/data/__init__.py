"""Data pipelines: MNIST + streaming audio (reference: datasets/)."""

from meanflow_audio_codec_tpu.data.audio import (
    DEFAULT_FRAME_SIZE,
    TARGET_SAMPLE_RATE,
    audio_to_frames,
    batch,
    buffer_shuffle,
    build_audio_pipeline,
    glob_audio_files,
    load_audio_file,
    load_audio_files,
    prefetch_batches,
    replay_pool_batches,
    synthetic_audio_pipeline,
    write_wav,
)
from meanflow_audio_codec_tpu.data.mnist import (
    load_mnist,
    load_mnist_arrays,
    synthetic_mnist,
)
