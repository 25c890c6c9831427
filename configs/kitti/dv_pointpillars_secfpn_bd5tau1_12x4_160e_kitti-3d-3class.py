# Dynamic-voxelize PointPillars + Bhattacharyya GD loss (reference
# configs/kitti/dv_pointpillars_secfpn_bd5tau1_12x4_160e_kitti-3d-3class.py)
_base_ = './hv_pointpillars_secfpn_bd5tau1_12x4_160e_kitti-3d-3class.py'
model = dict(voxelize_mode='dynamic')
