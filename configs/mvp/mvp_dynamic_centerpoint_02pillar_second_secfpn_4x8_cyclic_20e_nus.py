# MVP teacher: DynamicCenterPoint over 17-dim virtual points
# (reference: configs/mvp/mvp_dynamic_centerpoint_...py:17-33)
_base_ = ["../dynamic_centerpoint/"
          "dynamic_centerpoint_02pillar_second_secfpn_4x8_cyclic_20e_"
          "nus.py"]

model = dict(
    pts_voxel_encoder=dict(in_channels=17, virtual=True),
)

# virtual-point loading (merges *_VIRTUAL companions)
point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
class_names = [
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
]
train_pipeline = [
    dict(type="LoadPointsFromFile", coord_type="LIDAR", load_dim=5,
         use_dim=[0, 1, 2, 3, 4], virtual=True),
    dict(type="LoadPointsFromMultiSweeps", sweeps_num=9, virtual=True),
    dict(type="LoadAnnotations3D", with_bbox_3d=True,
         with_label_3d=True),
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
data = dict(train=dict(dataset=dict(pipeline=train_pipeline)))
