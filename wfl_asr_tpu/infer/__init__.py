from .pipeline import InferenceSession, infer_audio, infer_folder

__all__ = ["InferenceSession", "infer_audio", "infer_folder"]
