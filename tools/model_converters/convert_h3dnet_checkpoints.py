"""Upgrade pre-v0.6 H3DNet checkpoints (rpn-head-key surgery).

Reference: tools/model_converters/convert_h3dnet_checkpoints.py:119-171
— identical surgery to the VoteNet tool at the ``rpn_head`` prefix.
"""
from tools.model_converters.legacy_checkpoints import run_cli

if __name__ == "__main__":
    run_cli("rpn_head",
            "Upgrade legacy (pre-v0.6) H3DNet checkpoints")
