# PV-RCNN two-stage (reference configs/kitti/hv_pvrcnn_secfpn_4x4_80e_kitti-3d-3class.py).
# model.type='PVRCNN' routes tools/train.py to PVRCNNDetector; the model
# dict overrides engine/pvrcnn.py::KITTI_PVRCNN defaults, `head` the
# PartA2-style RPN head (KITTI_PVRCNN_RPN_HEAD).
_base_ = [
    '../_base_/datasets/kitti-3d-3class.py',
    '../_base_/schedules/cyclic_40e.py',
]
model = dict(
    type='PVRCNN',
    voxel_size=(0.05, 0.05, 0.1),
    point_cloud_range=(0., -40., -3., 70.4, 40., 1.),
    num_keypoints=2048,
    num_proposals=128,
)
head = dict(
    num_classes=3,
    anchor_generator=dict(
        ranges=[[0.2, -39.8, -0.6, 70.2, 39.8, -0.6],
                [0.2, -39.8, -0.6, 70.2, 39.8, -0.6],
                [0.2, -39.8, -1.78, 70.2, 39.8, -1.78]],
        sizes=[[0.8, 0.6, 1.73], [1.76, 0.6, 1.73], [3.9, 1.6, 1.56]],
        rotations=[0.0, 1.57],
    ),
    assigners=[
        dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
        dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
        dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45),
    ],
    loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
                  loss_weight=1.0),
    loss_bbox=dict(type='SmoothL1Loss', beta=1.0 / 9.0, loss_weight=2.0),
    loss_dir=dict(type='CrossEntropyLoss', use_sigmoid=False,
                  loss_weight=0.2),
    test_cfg=dict(use_rotate_nms=True, nms_thr=0.8, score_thr=0.0,
                  nms_pre=512, max_num=128),
)
data = dict(samples_per_gpu=4)
optimizer = dict(lr=0.001)
max_epochs = 80
