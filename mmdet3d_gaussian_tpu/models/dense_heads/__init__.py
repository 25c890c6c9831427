from . import anchor3d_head  # noqa: F401
