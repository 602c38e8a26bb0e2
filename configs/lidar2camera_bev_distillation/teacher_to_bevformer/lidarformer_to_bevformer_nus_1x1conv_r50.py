# LidarFormer -> BEVFormer-R50 FGD distillation
# (reference: configs/lidar2camera_bev_distillation/teacher_to_bevformer/
#  lidarformer_to_bevformer_nus_1x1conv_r50.py)
_base_ = ["../../_base_/datasets/nus-3d.py",
          "../../_base_/default_runtime.py"]

point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
class_names = [
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
]
_dim_ = 256
_ffn_dim_ = 512
bev_h_ = 200
bev_w_ = 200
queue_length = 4

model = dict(
    type="BEVFormerDistill",
    teacher_config="configs/teacher_transformer/lidarformer.py",
    teacher_ckpt=None,
    distill_type="fgd",
    distill_params=dict(
        student_channels=[256], teacher_channels=[256],
        spatial_t=0.5, spatial_student_ratio=1.0, channel_t=0.5,
        fg_feat_loss_weights=[3e-3], bg_feat_loss_weights=[4e-2],
        channel_loss_weights=[0.25], spatial_loss_weights=[1e-3],
        adaptation_type="1x1conv",
        student_adaptation_params=dict(kernel_size=1, stride=1),
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
        affinity_attention_topk=1000,
        affinity_criterion=dict(type="SmoothL1Loss"), affinity_split=1,
        non_empty_weight=0, output_threshold=0.1,
        groundtruth_threshold=None, fp_as_foreground="none",
        fp_weight=0, fp_epoch=0, multi_scale_epoch=-1,
        fp_scale_mode="average", gauss_fg_weight=-1e10,
        context_length=0, context_weight=0,
        hs_weight=0, query_weight=0),
    use_grid_mask=True,
    video_test_mode=True,
    # camera-scanned image encoder: N_cam-fold lower peak backbone
    # memory, exact under norm_eval=True (single-16GB-chip recipe)
    seq_img_encoder=True,
    # no-grad history frames run the SCA at the measured exact-cover
    # per-camera budget (0.35Q, test_model_bevformer TestSCACoverage)
    # instead of the default 0.4Q margin — identical outputs on every
    # covered geometry, ~12% fewer sampling rows on 3 of 4 encoder
    # passes per step (docs/PERF.md round 4).
    # GEOMETRY CAVEAT: 14000 = 0.35 * 200*200 is the measured exact
    # cover for the nuScenes 6-camera rig at BEV 200x200; with other
    # camera geometries or --cfg-options grid overrides, re-validate
    # with TestSCACoverage (cameras whose hit count exceeds the budget
    # silently drop contributions).  A fraction (e.g. 0.35) is also
    # accepted and scales with Q automatically.
    history_sca_budget=14000,
    img_backbone=dict(type="ResNet", depth=50, num_stages=4,
                      out_indices=(1, 2, 3), frozen_stages=1,
                      norm_cfg=dict(type="BN", requires_grad=False),
                      norm_eval=True, with_cp=True),
    img_neck=dict(type="FPN", in_channels=[512, 1024, 2048],
                  out_channels=_dim_, start_level=0,
                  add_extra_convs="on_output", num_outs=4,
                  relu_before_extra_convs=True),
    pts_bbox_head=dict(
        type="BEVFormerHead", bev_h=bev_h_, bev_w=bev_w_, num_query=900,
        num_classes=10, embed_dims=_dim_, pc_range=point_cloud_range,
        real_h=102.4, real_w=102.4, with_box_refine=True,
        code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2],
        transformer=dict(
            type="PerceptionTransformer", embed_dims=_dim_, num_cams=6,
            num_feature_levels=4, rotate_prev_bev=True, use_shift=True,
            use_can_bus=True,
            encoder=dict(num_layers=6, pc_range=point_cloud_range,
                         num_points_in_pillar=4, embed_dims=_dim_,
                         num_heads=8, feedforward_channels=_ffn_dim_,
                         num_levels=4, num_cams=6, with_cp=True,
                         scan_layers=True,
                         # current-frame SCA at the measured exact-
                         # cover budget too (same 0.35Q as
                         # history_sca_budget below, same coverage
                         # proof and geometry caveat): identical
                         # outputs, ~12% fewer sampling rows on the
                         # grad frame's forward AND backward
                         max_queries_per_cam=14000),
            decoder=dict(num_layers=6, embed_dims=_dim_, num_heads=8,
                         feedforward_channels=_ffn_dim_,
                         return_intermediate=True)),
        positional_encoding=dict(num_feats=_dim_ // 2,
                                 row_num_embed=bev_h_,
                                 col_num_embed=bev_w_),
        bbox_coder=dict(
            type="NMSFreeCoder",
            post_center_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
            pc_range=point_cloud_range, max_num=300, num_classes=10),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, reduction="mean", loss_weight=2.0),
        loss_bbox=dict(type="L1Loss", reduction="mean",
                       loss_weight=0.25)),
    train_cfg=dict(pts=dict(
        grid_size=[bev_h_, bev_w_, 1],
        voxel_size=[102.4 / bev_h_, 102.4 / bev_w_, 8],
        point_cloud_range=point_cloud_range, out_size_factor=1,
        assigner=dict(
            type="HungarianAssigner3D",
            cls_cost=dict(type="FocalLossCost", weight=2.0),
            reg_cost=dict(type="BBox3DL1Cost", weight=0.25),
            # fake cost for DETR-head compatibility, as in the reference
            iou_cost=dict(type="IoUCost", weight=0.0),
            pc_range=point_cloud_range))),
    test_cfg=dict(pts=dict()),
)

dataset_type = "CustomNuScenesDataset"
data_root = "data/nuscenes/"
input_modality = dict(use_lidar=True, use_camera=True, use_radar=False,
                      use_map=False, use_external=False)
img_norm_cfg = dict(mean=[103.530, 116.280, 123.675],
                    std=[1.0, 1.0, 1.0], to_rgb=False)

train_pipeline = [
    dict(type="LoadMultiViewImageFromFiles", to_float32=True),
    dict(type="LoadPointsFromFile", coord_type="LIDAR", load_dim=5,
         use_dim=5),
    dict(type="LoadPointsFromMultiSweeps", sweeps_num=9,
         use_dim=[0, 1, 2, 3, 4], pad_empty_sweeps=True,
         remove_close=True),
    dict(type="PhotoMetricDistortionMultiViewImage"),
    dict(type="LoadAnnotations3D", with_bbox_3d=True,
         with_label_3d=True),
    dict(type="PointsRangeFilter", point_cloud_range=point_cloud_range),
    dict(type="ObjectRangeFilter", point_cloud_range=point_cloud_range),
    dict(type="ObjectNameFilter", classes=class_names),
    dict(type="NormalizeMultiviewImage", **img_norm_cfg),
    dict(type="PadMultiViewImage", size_divisor=32),
    dict(type="DefaultFormatBundle3D", class_names=class_names),
    dict(type="CustomCollect3D",
         keys=["gt_bboxes_3d", "gt_labels_3d", "img", "points"]),
]
test_pipeline = [
    dict(type="LoadMultiViewImageFromFiles", to_float32=True),
    dict(type="NormalizeMultiviewImage", **img_norm_cfg),
    dict(type="PadMultiViewImage", size_divisor=32),
    dict(type="CustomCollect3D", keys=["img"]),
]

data = dict(
    samples_per_gpu=1,
    workers_per_gpu=4,
    train=dict(type=dataset_type, data_root=data_root,
               ann_file=data_root + "nuscenes_infos_temporal_train.pkl",
               pipeline=train_pipeline, classes=class_names,
               modality=input_modality, test_mode=False,
               use_valid_flag=True, bev_size=(bev_h_, bev_w_),
               queue_length=queue_length, box_type_3d="LiDAR"),
    val=dict(type=dataset_type, data_root=data_root,
             ann_file=data_root + "nuscenes_infos_temporal_val.pkl",
             pipeline=test_pipeline, classes=class_names,
             modality=input_modality, test_mode=True,
             bev_size=(bev_h_, bev_w_)),
    test=dict(type=dataset_type, data_root=data_root,
              ann_file=data_root + "nuscenes_infos_temporal_val.pkl",
              pipeline=test_pipeline, classes=class_names,
              modality=input_modality, test_mode=True,
              bev_size=(bev_h_, bev_w_)),
)

optimizer = dict(
    type="AdamW", lr=2e-4, weight_decay=0.01,
    paramwise_cfg=dict(custom_keys={
        "backbone": dict(lr_mult=0.1),
    }))
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy="CosineAnnealing", warmup="linear",
                 warmup_iters=500, warmup_ratio=1.0 / 3,
                 min_lr_ratio=1e-3)
runner = dict(type="EpochBasedRunner", max_epochs=24)
evaluation = dict(interval=4)
