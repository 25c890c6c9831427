# dynamic (point-level) voxelization variant
_base_ = './hv_pointpillars_secfpn_kld5tau1_12x4_160e_kitti-3d-3class.py'
model = dict(voxelize_mode='dynamic')
