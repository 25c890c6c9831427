# Plain CenterPoint pillar baseline (reference
# configs/nuscenes/centerpoint_02pillar_second_secfpn_8x4_cyclic_20e_nus.py):
# standard CenterHead (sin/cos rot regression), no GD loss.
_base_ = './centerpoint_02pillar_second_secfpn_gwd5_8x4_cyclic_20e_nus.py'
head = dict(
    yaw_mode=False,
    loss_gd=None,
    code_weights=[1.0] * 6 + [1.0, 1.0, 0.2, 0.2],
)
