from . import losses  # noqa: F401
from . import backbones, middle_encoders, roi_heads, voxel_encoders  # noqa: F401
from .dense_heads import anchor3d_head, centerpoint_head  # noqa: F401
from . import img_fusion  # noqa: F401
from .detectors import mvx_faster_rcnn, voxelnet  # noqa: F401
