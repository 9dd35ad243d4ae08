from .viz import visualize_prediction, clean_label  # noqa: F401
