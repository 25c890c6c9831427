# Waymo Vehicle-only baseline (reference
# configs/waymo/hv_pointpillars_secfpn_sbn_8x4_2x_waymo-3d-car.py)
_base_ = './hv_pointpillars_secfpn_sbn_8x4_2x_waymo-3d-3class.py'
model = dict(head_cfg=dict(num_classes=1, num_anchors=2))
head = dict(
    num_classes=1,
    anchor_generator=dict(
        aligned=True,
        ranges=[[-74.88, -74.88, -0.0345, 74.88, 74.88, -0.0345]],
        sizes=[[4.73, 2.08, 1.77]],
        rotations=[0.0, 1.57],
    ),
    assigners=[dict(pos_iou_thr=0.55, neg_iou_thr=0.4, min_pos_iou=0.4)],
)
