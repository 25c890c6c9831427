from .gaussian import (BAG_GD_LOSS, GDLoss, bd3d, gaussian_params, gd_loss,
                       gwd3d, jd3d, kfiou3d, kld3d, kld3d_symmax,
                       kld3d_symmin, postprocess, weight_reduce_loss)
from .common import (CrossEntropyLoss, FocalLoss, GaussianFocalLoss, L1Loss,
                     SmoothL1Loss, sigmoid_focal_loss)
