# The north-star config: PointPillars trained purely on KLD Gaussian distance.
# Reference: configs/kitti/hv_pointpillars_secfpn_kld5tau1_12x4_160e_kitti-3d-3class.py
_base_ = [
    '../_base_/models/hv_pointpillars_secfpn_kitti.py',
    '../_base_/datasets/kitti-3d-3class.py',
    '../_base_/schedules/cyclic_40e.py',
    '../_base_/default_runtime.py',
]

head = dict(
    loss_decoded_bbox=dict(type='GDLoss', loss_type='kld3d',
                           center_offset=(0, 0, 0.5), fun='log1p', tau=1.0,
                           alpha=1.0, loss_weight=5.0),
    code_weight=[0., 0., 0., 0., 0., 0., 0.],
    decode_weight=1.0,
)

data = dict(samples_per_gpu=12)
optimizer = dict(lr=0.001)
