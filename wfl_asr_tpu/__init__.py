"""WFL-ASR-TPU: a TPU-native (JAX/XLA/Pallas) frame-level phoneme segmentation
framework with the capabilities of usamireko/WFL-ASR.

Layer map (mirrors SURVEY.md §1, re-architected for TPU):

- ``wfl_asr_tpu.config``     — typed config over the reference's ``config.yaml`` schema
- ``wfl_asr_tpu.labels``     — HTK ``.lab`` / BIO-tag formats, decode, merge (host, parity-critical)
- ``wfl_asr_tpu.metrics``    — frame accuracy / PER / TER
- ``wfl_asr_tpu.ops``        — device ops: fused STFT→log-mel front-end, median filter,
                               device-side BIO decode (XLA/Pallas)
- ``wfl_asr_tpu.models``     — JAX encoders (Whisper, WavLM) + heads (BiLSTM, Conformer,
                               dilated conv, boundary-offset) + the BIO tagger
- ``wfl_asr_tpu.data``       — host data pipeline (WAV I/O, resample, augmentation, bucketing)
- ``wfl_asr_tpu.train``      — losses, Prodigy-in-optax, schedules, jitted train step, orbax
- ``wfl_asr_tpu.infer``      — chunked inference pipeline, language averaging, logits cache
- ``wfl_asr_tpu.parallel``   — mesh construction and NamedShardings (DP-first)
"""

__version__ = "0.1.0"

FRAME_DURATION = 0.02      # 20 ms frames (reference: config.yaml:6, infer.py:12)
MAX_SEGMENT_DURATION = 30.0  # max audio seconds per forward (reference: infer.py:13)
SAMPLE_RATE = 16000        # reference: config.yaml:3
HTK_TIME_FACTOR = 1e7      # HTK .lab uses 100 ns units (reference: utils.py:8)
