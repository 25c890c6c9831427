# nuScenes 10-class data pipeline (reference configs/_base_/datasets/nus-3d.py)
dataset_type = 'NuScenesDataset'
data_root = 'data/nuscenes/'
class_names = ['car', 'truck', 'trailer', 'bus', 'construction_vehicle',
               'bicycle', 'motorcycle', 'pedestrian', 'traffic_cone',
               'barrier']
point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]

train_pipeline = [
    dict(type='LoadPointsFromFile', load_dim=5, use_dim=5),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=9,
         use_dim=[0, 1, 2, 3, 4], pad_empty_sweeps=True,
         remove_close=True),
    dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5,
         flip_ratio_bev_vertical=0.5),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.78539816, 0.78539816],
         scale_ratio_range=[0.95, 1.05],
         translation_std=[0.5, 0.5, 0.5]),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='PointShuffle'),
    dict(type='Pad3D', num_points=60000, num_gt=128),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', load_dim=5, use_dim=5),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=9,
         use_dim=[0, 1, 2, 3, 4], pad_empty_sweeps=True,
         remove_close=True, test_mode=True),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='Pad3D', num_points=60000, num_gt=128),
]

data = dict(
    samples_per_gpu=4,
    train=dict(
        type='CBGSDataset',   # reference nus config :156-158
        dataset=dict(type=dataset_type, data_root=data_root,
               ann_file=data_root + 'nuscenes_infos_train.pkl',
               pipeline=train_pipeline, classes=class_names)),
    val=dict(type=dataset_type, data_root=data_root,
             ann_file=data_root + 'nuscenes_infos_val.pkl',
             pipeline=test_pipeline, classes=class_names, test_mode=False),
)
