# PointPillars SmoothL1 baseline, 8-chip x 6-sample schedule
# (reference configs/kitti/hv_pointpillars_secfpn_6x8_160e_kitti-3d-3class.py)
_base_ = './hv_pointpillars_secfpn_12x4_160e_kitti-3d-3class.py'
data = dict(samples_per_gpu=6)
optimizer = dict(lr=0.0018)
