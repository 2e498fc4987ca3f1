from flowtron_tpu.audio.stft import (  # noqa: F401
    MelSpectrogram,
    hann_window,
    dynamic_range_compression,
    dynamic_range_decompression,
)
from flowtron_tpu.audio.mel import mel_filterbank  # noqa: F401
