from . import config, se2, se3, timing, types  # noqa: F401
