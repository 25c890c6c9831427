"""mmdet3d_gaussian_tpu — a TPU-native (JAX/XLA/Pallas/pjit) 3D detection
framework with the capabilities of zhanggefan/mmdet3d-gaussian:
Gaussian-distance box regression losses, dynamic/hard voxelization,
PointPillars/CenterPoint-family detectors, flexible COCO-style 3D mAP
evaluation, and SPMD multi-chip training over a jax.sharding.Mesh."""
__version__ = '0.1.0'

from . import registry  # noqa: F401
# Importing subpackages executes their @register_module decorators, filling
# the registries (the analogue of the reference's import-time registration
# chain, mmdet3d_gaussian/__init__.py:1-3).
from . import models  # noqa: F401
from . import core  # noqa: F401
from . import datasets  # noqa: F401
