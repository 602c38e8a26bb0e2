# MVPFormer -> BEVFormer-R50 FGD distillation
# (reference: mvpformer_to_bevformer_nus_1x1conv_r50.py)
_base_ = ["./lidarformer_to_bevformer_nus_1x1conv_r50.py"]

model = dict(
    teacher_config="configs/teacher_transformer/mvpformer.py",
)
