# LidarFormer teacher (SparseEncoder + DETR-style head)
# (reference: configs/teacher_transformer/lidarformer.py)
_base_ = ["../_base_/datasets/nus-3d.py",
          "../_base_/default_runtime.py"]

point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
voxel_size = [0.064, 0.064, 0.2]
_dim_ = 256
_ffn_dim_ = 512

class_names = [
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
]

model = dict(
    type="LidarFormer",
    pts_voxel_layer=dict(max_num_points=10, voxel_size=voxel_size,
                         max_voxels=(90000, 120000),
                         point_cloud_range=point_cloud_range),
    pts_voxel_encoder=dict(type="HardSimpleVFE", num_features=5),
    pts_middle_encoder=dict(
        type="SparseEncoder", in_channels=5,
        sparse_shape=[41, 1600, 1600], output_channels=128,
        order=("conv", "norm", "act"),
        encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128),
                          (128, 128)),
        encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)),
                          (0, 0)),
        block_type="basicblock", max_active=120000),
    pts_backbone=dict(
        type="SECOND", in_channels=256, out_channels=[128, 256],
        layer_nums=[5, 5], layer_strides=[1, 2],
        norm_cfg=dict(type="BN", eps=1e-3, momentum=0.01)),
    pts_neck=dict(
        type="FPN", norm_cfg=dict(type="BN2d", eps=1e-3, momentum=0.01),
        in_channels=[128, 256], out_channels=256, start_level=0,
        num_outs=4),
    pts_bbox_head=dict(
        type="DGCNN3DHead", num_query=900, num_classes=10,
        embed_dims=_dim_, pc_range=point_cloud_range,
        code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2],
        with_box_refine=True,
        transformer=dict(
            type="DeformableDetrTransformerDistill", embed_dims=_dim_,
            num_encoder_layers=6, feedforward_channels=_ffn_dim_,
            decoder=dict(num_layers=6, embed_dims=_dim_, num_heads=8,
                         feedforward_channels=_ffn_dim_,
                         return_intermediate=True)),
        bbox_coder=dict(
            type="NMSFreeCoder",
            post_center_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
            pc_range=point_cloud_range, max_num=300, num_classes=10),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, reduction="mean", loss_weight=2.0),
        loss_bbox=dict(type="L1Loss", reduction="mean",
                       loss_weight=0.25)),
    train_cfg=dict(pts=dict(
        grid_size=[1600, 1600, 40], voxel_size=voxel_size,
        point_cloud_range=point_cloud_range, out_size_factor=8)),
    test_cfg=dict(pts=dict()),
)

optimizer = dict(
    type="AdamW", lr=1e-4, weight_decay=0.01,
    paramwise_cfg=dict(custom_keys={
        "backbone": dict(lr_mult=0.1),
    }))
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy="CosineAnnealing", warmup="linear",
                 warmup_iters=500, warmup_ratio=1.0 / 3,
                 min_lr_ratio=1e-3)
runner = dict(type="EpochBasedRunner", max_epochs=20)
