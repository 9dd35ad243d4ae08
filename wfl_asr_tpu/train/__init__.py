from . import losses, prodigy, schedules  # noqa: F401
