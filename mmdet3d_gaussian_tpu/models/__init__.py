from . import losses  # noqa: F401
from . import backbones, voxel_encoders  # noqa: F401
from .dense_heads import anchor3d_head  # noqa: F401
from .detectors import voxelnet  # noqa: F401
