# MVPFormer teacher: LidarFormer consuming 17-dim MVP virtual points via
# DynamicVoxelEncoder (reference: configs/teacher_transformer/
# mvpformer.py + mmdet3d/models/detectors/mvpformer.py)
_base_ = ["./lidarformer.py"]

model = dict(
    type="MVPFormer",
    pts_voxel_encoder=dict(
        _delete_=True,
        type="DynamicVoxelEncoder",
        voxel_layer=dict(
            voxel_size=[0.064, 0.064, 0.2],
            point_cloud_range=[-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]),
        voxel_encoder=dict(
            type="DynamicVFE", in_channels=17, feat_channels=[5],
            with_cluster_center=False, with_voxel_center=False,
            voxel_size=[0.064, 0.064, 0.2],
            point_cloud_range=[-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
            norm_cfg=dict(type="BN1d", eps=1e-3, momentum=0.01)),
        max_voxels=120000),
)
