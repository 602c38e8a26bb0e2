# CenterPoint-pillar -> BEVDepth4D-R50 FGD distillation (the headline
# recipe; reference: configs/lidar2camera_bev_distillation/
# centerpoint_pillar_to_bevdepth4d_r50/centerpoint_02pillar_second_
# secfpn_circlenms_8x4_cyclic_20e_nus_to_bevdepth4d_r50.py)
_base_ = ["../../_base_/datasets/nus-3d.py",
          "../../_base_/default_runtime.py"]

point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
class_names = [
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
]
data_config = {
    "cams": ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
             "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT"],
    "Ncams": 6,
    "input_size": (256, 704),
    "src_size": (900, 1600),
    "resize": (-0.06, 0.11),
    "rot": (-5.4, 5.4),
    "flip": True,
    "crop_h": (0.0, 0.0),
    "resize_test": 0.04,
}
grid_config = {
    "xbound": [-51.2, 51.2, 0.8],
    "ybound": [-51.2, 51.2, 0.8],
    "zbound": [-10.0, 10.0, 20.0],
    "dbound": [1.0, 60.0, 1.0],
}
voxel_size = [0.1, 0.1, 0.2]
numC_Trans = 64

model = dict(
    type="BEVDepth4DDistill",
    teacher_config="configs/centerpoint/"
                   "centerpoint_02pillar_second_secfpn_4x8_cyclic_20e_"
                   "nus.py",
    teacher_ckpt=None,
    self_ckpt=None,
    distill_type="fgd",
    distill_params=dict(
        student_channels=[256], teacher_channels=[384],
        spatial_t=0.5, spatial_student_ratio=1.0, channel_t=0.5,
        fg_feat_loss_weights=[1.5e-3], bg_feat_loss_weights=[4e-2],
        channel_loss_weights=[0.25], spatial_loss_weights=[2.5e-3],
        adaptation_type="1x1conv",
        student_adaptation_params=dict(kernel_size=1, stride=1,
                                       upsample_factor=4),
        teacher_adaptation_type="identity",
        teacher_adaptation_params=dict(kernel_size=4, stride=4),
        spatial_attentions=["teacher"],
        feat_criterion=dict(type="MSELoss", reduction="none"),
        spatial_criterion=dict(type="L1Loss", reduction="none"),
        channel_criterion=dict(type="L1Loss", reduction="none"),
        transpose_mask=False, foreground_mask="gt",
        background_mask="logical_not", scale_mask="combine_gt",
        spatial_mask=True, channel_mask=True,
        student_feat_pos=["head"], teacher_feat_pos=["head"],
        two_stage_epoch=-1, affinity_weights=[0], affinity_mode="none",
        affinity_criterion=dict(type="SmoothL1Loss"), affinity_split=1,
        non_empty_weight=0, output_threshold=1.0,
        groundtruth_threshold=None, fp_as_foreground="none",
        fp_weight=0, fp_epoch=0, multi_scale_epoch=-1,
        fp_scale_mode="dfs", gauss_fg_weight=-1e10,
        context_length=0, context_weight=0),
    aligned=True, detach=True, before=True, inherit_head=True,
    img_backbone=dict(type="ResNet", depth=50, num_stages=4,
                      out_indices=(2, 3), frozen_stages=-1,
                      norm_cfg=dict(type="BN"), norm_eval=False,
                      with_cp=True),
    img_neck=dict(type="FPNForBEVDet", in_channels=[1024, 2048],
                  out_channels=512, num_outs=1, start_level=0,
                  out_ids=[0]),
    img_view_transformer=dict(
        type="ViewTransformerLSSBEVDepth", loss_depth_weight=100.0,
        grid_config=grid_config, data_config=data_config,
        numC_Trans=numC_Trans, numC_input=512, downsample=16,
        extra_depth_net=dict(type="ResNetForBEVDet", numC_input=256,
                             num_layer=[3], num_channels=[256],
                             stride=[1])),
    img_bev_encoder_backbone=dict(type="ResNetForBEVDet",
                                  numC_input=128,
                                  num_channels=[128, 256, 512]),
    img_bev_encoder_neck=dict(type="FPN_LSS",
                              in_channels=numC_Trans * 8 + numC_Trans * 2,
                              out_channels=256),
    pre_process=dict(type="ResNetForBEVDet", numC_input=numC_Trans,
                     num_layer=[2], num_channels=[64], stride=[1],
                     backbone_output_ids=[0]),
    pts_bbox_head=dict(
        type="CenterHead", in_channels=256,
        tasks=[
            dict(num_class=1, class_names=["car"]),
            dict(num_class=2,
                 class_names=["truck", "construction_vehicle"]),
            dict(num_class=2, class_names=["bus", "trailer"]),
            dict(num_class=1, class_names=["barrier"]),
            dict(num_class=2, class_names=["motorcycle", "bicycle"]),
            dict(num_class=2,
                 class_names=["pedestrian", "traffic_cone"]),
        ],
        common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2), vel=(2, 2)),
        share_conv_channel=64,
        bbox_coder=dict(
            type="CenterPointBBoxCoder",
            post_center_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
            max_num=500, score_threshold=0.1, out_size_factor=4,
            pc_range=point_cloud_range[:2], voxel_size=[0.2, 0.2],
            code_size=9),
        separate_head=dict(type="SeparateHead", init_bias=-2.19,
                           final_kernel=3),
        loss_cls=dict(type="GaussianFocalLoss", reduction="mean"),
        loss_bbox=dict(type="L1Loss", reduction="mean",
                       loss_weight=0.25),
        norm_bbox=True),
    train_cfg=dict(pts=dict(
        grid_size=[512, 512, 1], voxel_size=[0.2, 0.2, 8],
        point_cloud_range=point_cloud_range, out_size_factor=4,
        dense_reg=1, gaussian_overlap=0.1, max_objs=500, min_radius=2,
        code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2,
                      0.2])),
    test_cfg=dict(pts=dict(
        post_center_limit_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
        max_per_img=500, max_pool_nms=False,
        min_radius=[4, 12, 10, 1, 0.85, 0.175], score_threshold=0.1,
        pc_range=point_cloud_range[:2], out_size_factor=4,
        voxel_size=[0.2, 0.2], nms_type="circle", pre_max_size=1000,
        post_max_size=83, nms_thr=0.2)),
)

data_root = "data/nuscenes/"
train_pipeline = [
    dict(type="LoadMultiViewImageFromFiles_BEVDet",
         data_config=data_config, is_train=True, sequential=True,
         aligned=True, trans_only=False, root_path=data_root),
    dict(type="LoadPointsFromFile", coord_type="LIDAR", load_dim=5,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type="LoadAnnotations3D", with_bbox_3d=True,
         with_label_3d=True),
    dict(type="PointToMultiViewDepth", grid_config=grid_config,
         downsample=16),
    dict(type="GlobalRotScaleTrans", rot_range=[-0.3925, 0.3925],
         scale_ratio_range=[0.95, 1.05], translation_std=[0, 0, 0],
         update_img2lidar=True),
    dict(type="RandomFlip3D", sync_2d=False,
         flip_ratio_bev_horizontal=0.5, flip_ratio_bev_vertical=0.5,
         update_img2lidar=True),
    dict(type="PointsRangeFilter", point_cloud_range=point_cloud_range),
    dict(type="ObjectRangeFilter", point_cloud_range=point_cloud_range),
    dict(type="ObjectNameFilter", classes=class_names),
    # host-side pillar-key sort (matches the teacher's pts_voxel_layer):
    # lets the teacher's fused pillar path skip its on-device sort+gather
    dict(type="SortPointsByPillar", voxel_size=[0.2, 0.2, 8],
         point_cloud_range=point_cloud_range),
    dict(type="DefaultFormatBundle3D", class_names=class_names),
    dict(type="Collect3D",
         keys=["points", "gt_bboxes_3d", "img_inputs"]),
]
test_pipeline = [
    dict(type="LoadMultiViewImageFromFiles_BEVDet",
         data_config=data_config, sequential=True, aligned=True,
         trans_only=False, root_path=data_root),
    dict(type="LoadPointsFromFile", coord_type="LIDAR", load_dim=5,
         use_dim=[0, 1, 2, 3, 4]),
    dict(type="PointToMultiViewDepth", grid_config=grid_config,
         downsample=16),
    dict(type="DefaultFormatBundle3D", class_names=class_names),
    dict(type="Collect3D", keys=["points", "img_inputs"]),
]

data = dict(
    samples_per_gpu=8,
    workers_per_gpu=4,
    train=dict(type="NuScenesDataset", data_root=data_root,
               ann_file=data_root +
               "nuscenes_infos_train_4d_interval3_max60.pkl",
               pipeline=train_pipeline, classes=class_names,
               test_mode=False, use_valid_flag=True,
               modality=dict(use_lidar=True, use_camera=True,
                             use_radar=False, use_map=False,
                             use_external=False),
               img_info_prototype="bevdet_sequential",
               speed_mode="abs_dis", max_interval=9, min_interval=2,
               prev_only=True, fix_direction=True),
    val=dict(pipeline=test_pipeline, classes=class_names,
             img_info_prototype="bevdet_sequential",
             speed_mode="abs_dis", max_interval=10, min_interval=1,
             prev_only=True, fix_direction=True,
             ann_file=data_root +
             "nuscenes_infos_val_4d_interval3_max60.pkl"),
    test=dict(pipeline=test_pipeline, classes=class_names,
              img_info_prototype="bevdet_sequential",
              speed_mode="abs_dis", max_interval=10, min_interval=1,
              prev_only=True, fix_direction=True,
              ann_file=data_root +
              "nuscenes_infos_val_4d_interval3_max60.pkl"),
)

optimizer = dict(type="AdamW", lr=2e-4, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=5, norm_type=2))
lr_config = dict(policy="step", warmup="linear", warmup_iters=200,
                 warmup_ratio=0.001, step=[16, 22])
runner = dict(type="EpochBasedRunner", max_epochs=24)
evaluation = dict(interval=4)
checkpoint_config = dict(interval=1, max_keep_ckpts=3)
