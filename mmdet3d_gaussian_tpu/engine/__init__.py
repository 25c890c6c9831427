from . import detector, loop, pvrcnn  # noqa: F401
