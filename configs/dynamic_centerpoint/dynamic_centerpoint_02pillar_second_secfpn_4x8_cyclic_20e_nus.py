# Dynamic-voxelization CenterPoint teacher
# (reference: configs/dynamic_centerpoint/
#  dynamic_centerpoint_02pillar_second_secfpn_4x8_cyclic_20e_nus.py)
_base_ = ["../centerpoint/"
          "centerpoint_02pillar_second_secfpn_4x8_cyclic_20e_nus.py"]

voxel_size = [0.2, 0.2, 8]
model = dict(
    type="DynamicCenterPoint",
    max_voxels=32000,
    pts_voxel_encoder=dict(
        _delete_=True,
        type="DynamicPillarFeatureNet",
        in_channels=5, feat_channels=[64], with_distance=False,
        voxel_size=tuple(voxel_size),
        point_cloud_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
        norm_cfg=dict(type="BN1d", eps=1e-3, momentum=0.01)),
)
