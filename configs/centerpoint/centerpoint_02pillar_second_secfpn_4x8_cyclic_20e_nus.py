# CenterPoint-pillar teacher training recipe
# (reference: configs/centerpoint/
#  centerpoint_02pillar_second_secfpn_4x8_cyclic_20e_nus.py)
_base_ = [
    "../_base_/datasets/nus-3d.py",
    "../_base_/models/centerpoint_02pillar_second_secfpn_nus.py",
    "../_base_/schedules/cyclic_20e.py",
    "../_base_/default_runtime.py",
]

point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
class_names = [
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
]
data_root = "data/nuscenes/"

db_sampler = dict(
    data_root=data_root,
    info_path=data_root + "nuscenes_dbinfos_train.pkl",
    rate=1.0,
    prepare=dict(
        filter_by_difficulty=[-1],
        filter_by_min_points=dict(
            car=5, truck=5, bus=5, trailer=5, construction_vehicle=5,
            traffic_cone=5, barrier=5, motorcycle=5, bicycle=5,
            pedestrian=5)),
    classes=class_names,
    sample_groups=dict(
        car=2, truck=3, construction_vehicle=7, bus=4, trailer=6,
        barrier=2, motorcycle=6, bicycle=6, pedestrian=2,
        traffic_cone=2))

train_pipeline = [
    dict(type="LoadPointsFromFile", coord_type="LIDAR", load_dim=5,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type="LoadPointsFromMultiSweeps", sweeps_num=9),
    dict(type="LoadAnnotations3D", with_bbox_3d=True,
         with_label_3d=True),
    dict(type="ObjectSample", db_sampler=db_sampler),
    dict(type="GlobalRotScaleTrans", rot_range=[-0.3925, 0.3925],
         scale_ratio_range=[0.95, 1.05], translation_std=[0, 0, 0]),
    dict(type="RandomFlip3D", flip_ratio_bev_horizontal=0.5,
         flip_ratio_bev_vertical=0.5),
    dict(type="PointsRangeFilter", point_cloud_range=point_cloud_range),
    dict(type="ObjectRangeFilter", point_cloud_range=point_cloud_range),
    dict(type="ObjectNameFilter", classes=class_names),
    dict(type="PointShuffle"),
    dict(type="DefaultFormatBundle3D", class_names=class_names),
    dict(type="Collect3D", keys=["points", "gt_bboxes_3d"]),
]
test_pipeline = [
    dict(type="LoadPointsFromFile", coord_type="LIDAR", load_dim=5,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type="LoadPointsFromMultiSweeps", sweeps_num=9,
         test_mode=True),
    dict(type="DefaultFormatBundle3D"),
    dict(type="Collect3D", keys=["points"]),
]

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=4,
    train=dict(
        type="CBGSDataset",
        dataset=dict(
            type="NuScenesDataset", data_root=data_root,
            ann_file=data_root + "nuscenes_infos_train.pkl",
            pipeline=train_pipeline, classes=class_names,
            test_mode=False, use_valid_flag=True)),
    val=dict(pipeline=test_pipeline, classes=class_names),
    test=dict(pipeline=test_pipeline, classes=class_names),
)

optimizer = dict(type="AdamW", lr=1e-4, weight_decay=0.01)
runner = dict(type="EpochBasedRunner", max_epochs=20)
evaluation = dict(interval=20)
