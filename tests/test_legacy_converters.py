"""Legacy checkpoint converters (regnet2mmdet, votenet/h3dnet upgrade).

Parity targets: reference tools/model_converters/regnet2mmdet.py:7-77
(key mapping oracle transcribed below) and
convert_votenet_checkpoints.py:94-146 / convert_h3dnet_checkpoints.py
:119-171 (rename + drop + conv_out split).
"""
import torch

from tools.model_converters.legacy_checkpoints import (
    convert_regnet_state, dataset_num_classes, upgrade_legacy_vote_head)


def test_regnet_key_mapping():
    t = torch.zeros(1)
    blobs = {
        "stem.conv.weight": t, "stem.bn.weight": t,
        "stem.bn.running_mean": t, "head.fc.weight": t,
        "s1.b1.proj.weight": t, "s1.b1.bn.running_var": t,
        "s1.b1.f.a.weight": t, "s1.b1.f.a_bn.weight": t,
        "s2.b3.f.b.weight": t, "s2.b3.f.b_bn.bias": t,
        "s4.b2.f.c.weight": t, "s4.b2.f.c_bn.running_mean": t,
        "train_meta": t,   # pycls bookkeeping, not a layer
    }
    state, skipped = convert_regnet_state(blobs)
    # oracle pairs per reference regnet2mmdet.py:7-52
    expected = {
        "conv1.weight", "bn1.weight", "bn1.running_mean", "fc.weight",
        "layer1.0.downsample.0.weight", "layer1.0.downsample.1.running_var",
        "layer1.0.conv1.weight", "layer1.0.bn1.weight",
        "layer2.2.conv2.weight", "layer2.2.bn2.bias",
        "layer4.1.conv3.weight", "layer4.1.bn3.running_mean",
    }
    assert set(state) == expected
    assert skipped == ["train_meta"]


def _legacy_head_state(prefix):
    c = dataset_num_classes("SUNRGBDDataset")     # 10
    reg_rows = 7
    fused_w = torch.arange(2 + reg_rows + c, dtype=torch.float32)[:, None]
    return {
        f"{prefix}.conv_pred.0.conv.weight": torch.zeros(2),
        f"{prefix}.conv_pred.0.bn.weight": torch.zeros(2),
        f"{prefix}.conv_pred.0.bn.num_batches_tracked": torch.zeros(1),
        f"{prefix}.conv_pred.1.conv.weight": torch.zeros(2),
        f"{prefix}.conv_pred.1.bn.num_batches_tracked": torch.zeros(1),
        f"{prefix}.conv_pred.conv_out.weight": fused_w.clone(),
        f"{prefix}.conv_pred.conv_out.bias": fused_w[:, 0].clone(),
        "backbone.sa1.mlp.weight": torch.zeros(3),   # untouched
    }, c, reg_rows


def _check_upgrade(prefix):
    state, c, reg_rows = _legacy_head_state(prefix)
    out = upgrade_legacy_vote_head(state, c, prefix)
    p = prefix
    assert f"{p}.conv_pred.shared_convs.layer0.conv.weight" in out
    assert f"{p}.conv_pred.shared_convs.layer1.conv.weight" in out
    assert not any("num_batches_tracked" in k for k in out)
    assert not any(".conv_pred.0." in k or ".conv_pred.1." in k
                   for k in out)
    assert f"{p}.conv_pred.conv_out.weight" not in out
    # split semantics: cls = rows [0:2] + last C; reg = middle block
    w = out[f"{p}.conv_pred.conv_cls.weight"][:, 0]
    assert w.tolist() == [0, 1] + list(range(2 + reg_rows,
                                             2 + reg_rows + c))
    r = out[f"{p}.conv_pred.conv_reg.weight"][:, 0]
    assert r.tolist() == list(range(2, 2 + reg_rows))
    assert out[f"{p}.conv_pred.conv_cls.bias"].shape == (2 + c,)
    assert torch.equal(out["backbone.sa1.mlp.weight"], torch.zeros(3))


def test_votenet_upgrade():
    _check_upgrade("bbox_head")


def test_h3dnet_upgrade():
    _check_upgrade("rpn_head")
