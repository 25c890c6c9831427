# SmoothL1 baseline: sin-diff regression, no Gaussian loss
_base_ = './hv_pointpillars_secfpn_kld5tau1_12x4_160e_kitti-3d-3class.py'
head = dict(loss_decoded_bbox=None, code_weight=[1.] * 7, decode_weight=None)
