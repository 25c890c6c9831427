# Waymo full-range PointPillars + GWD (reference waymo config family).
_base_ = [
    '../_base_/models/hv_pointpillars_secfpn_waymo.py',
    '../_base_/datasets/waymo-3d-3class.py',
    '../_base_/schedules/schedule_2x.py',
    '../_base_/default_runtime.py',
]
head = dict(
    loss_decoded_bbox=dict(type='GDLoss', loss_type='gwd3d',
                           center_offset=(0, 0, 0.5), fun='log1p', tau=0.0,
                           loss_weight=5.0),
    code_weight=[0.] * 7,
    decode_weight=1.0,
)
