# Waymo Vehicle-only + GWD (reference
# configs/waymo/hv_pointpillars_secfpn_gwd5_sbn_8x4_2x_waymo-3d-car.py)
_base_ = './hv_pointpillars_secfpn_sbn_8x4_2x_waymo-3d-car.py'
head = dict(
    loss_decoded_bbox=dict(type='GDLoss', loss_type='gwd3d',
                           center_offset=(0, 0, 0.5), fun='log1p', tau=0.0,
                           loss_weight=5.0),
    code_weight=[0.] * 7,
    decode_weight=1.0,
)
