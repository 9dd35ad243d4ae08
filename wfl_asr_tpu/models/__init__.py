from . import layers, wavlm, whisper, convert  # noqa: F401
