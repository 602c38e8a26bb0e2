# MVP (virtual-point) teacher -> BEVDepth4D-R50 distillation
# (reference: ..._to_bevdepth4d_r50_virtual.py — same recipe with the
# MVP DynamicCenterPoint teacher over 17-dim virtual points)
_base_ = ["./centerpoint_02pillar_second_secfpn_circlenms_8x4_cyclic_"
          "20e_nus_to_bevdepth4d_r50.py"]

model = dict(
    teacher_config="configs/mvp/"
                   "mvp_dynamic_centerpoint_02pillar_second_secfpn_"
                   "4x8_cyclic_20e_nus.py",
)
