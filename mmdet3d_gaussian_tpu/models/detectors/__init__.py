from . import mvx_faster_rcnn, voxelnet  # noqa: F401
