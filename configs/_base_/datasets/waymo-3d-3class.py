# Waymo 3-class data pipeline (reference configs/_base_/datasets/waymo-3d-3class.py)
dataset_type = 'WaymoDataset'
data_root = 'data/waymo/kitti_format/'
class_names = ['Car', 'Pedestrian', 'Cyclist']
point_cloud_range = [-74.88, -74.88, -2, 74.88, 74.88, 4]

train_pipeline = [
    dict(type='LoadPointsFromFile', load_dim=6, use_dim=5),
    dict(type='NormalizeIntensityTanh', intensity_column=3),
    dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5,
         flip_ratio_bev_vertical=0.5),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.78539816, 0.78539816],
         scale_ratio_range=[0.95, 1.05]),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='PointShuffle'),
    dict(type='Pad3D', num_points=180000, num_gt=256),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', load_dim=6, use_dim=5),
    dict(type='NormalizeIntensityTanh', intensity_column=3),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='Pad3D', num_points=180000, num_gt=256),
]

data = dict(
    samples_per_gpu=4,
    train=dict(type=dataset_type, data_root=data_root,
               ann_file=data_root + 'waymo_infos_train.pkl',
               pipeline=train_pipeline, classes=class_names,
               use_shared_memory=True),
    val=dict(type=dataset_type, data_root=data_root,
             ann_file=data_root + 'waymo_infos_val.pkl',
             pipeline=test_pipeline, classes=class_names, test_mode=False),
)
