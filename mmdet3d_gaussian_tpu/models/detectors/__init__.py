from . import voxelnet  # noqa: F401
