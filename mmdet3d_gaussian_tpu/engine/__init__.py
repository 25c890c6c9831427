from . import detector, loop, mvx, pvrcnn  # noqa: F401
