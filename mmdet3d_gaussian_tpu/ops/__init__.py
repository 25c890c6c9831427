from . import heatmap, nms, rotated_iou, scatter, sparse_conv, voxelize, vsa  # noqa: F401
