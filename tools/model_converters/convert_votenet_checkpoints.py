"""Upgrade pre-v0.6 VoteNet checkpoints (head-key surgery).

Reference: tools/model_converters/convert_votenet_checkpoints.py:94-146.
"""
from tools.model_converters.legacy_checkpoints import run_cli

if __name__ == "__main__":
    run_cli("bbox_head",
            "Upgrade legacy (pre-v0.6) VoteNet checkpoints")
