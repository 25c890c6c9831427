# Plain (SmoothL1) Waymo PointPillars baseline (reference
# configs/waymo/hv_pointpillars_secfpn_sbn_8x4_2x_waymo-3d-3class.py)
_base_ = './hv_pointpillars_secfpn_gwd5_sbn_8x4_2x_waymo-3d-3class.py'
head = dict(loss_decoded_bbox=None, code_weight=[1.] * 7, decode_weight=None)
