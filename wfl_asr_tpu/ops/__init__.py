from .frontend import (
    mel_filterbank,
    stft_power,
    whisper_log_mel,
    mel_spectrogram,
    wav2vec2_normalize,
    WHISPER_N_SAMPLES,
    WHISPER_N_FRAMES,
)
from .postprocess import median_filter_ids, confidence_gate_ids

__all__ = [
    "mel_filterbank", "stft_power", "whisper_log_mel", "mel_spectrogram",
    "wav2vec2_normalize", "WHISPER_N_SAMPLES", "WHISPER_N_FRAMES",
    "median_filter_ids", "confidence_gate_ids",
]
