from . import nms, rotated_iou, scatter, voxelize  # noqa: F401
