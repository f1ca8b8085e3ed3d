from avsr_tpu.ops.attention import attention, flash_attention, mha_reference  # noqa: F401
from avsr_tpu.ops.image import preprocess_frames, sample_frame_indices  # noqa: F401
from avsr_tpu.ops.logmel import log_mel_spectrogram, mel_filterbank  # noqa: F401
