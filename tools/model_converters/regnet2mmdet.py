"""Convert pycls RegNet checkpoints to mmdet-style naming.

Reference: tools/model_converters/regnet2mmdet.py:1-89.  Pure key
surgery; see legacy_checkpoints.convert_regnet_state for the mapping.
"""
import argparse

import torch

from tools.model_converters.legacy_checkpoints import convert_regnet_state


def main():
    ap = argparse.ArgumentParser(description="pycls RegNet -> mmdet keys")
    ap.add_argument("src", help="pycls checkpoint (has 'model_state')")
    ap.add_argument("dst", help="output path")
    args = ap.parse_args()
    blobs = torch.load(args.src, map_location="cpu")["model_state"]
    state, skipped = convert_regnet_state(blobs)
    for key in skipped:
        print(f"not converted: {key}")
    torch.save({"state_dict": state}, args.dst)
    print(f"converted {len(state)} keys -> {args.dst}")


if __name__ == "__main__":
    main()
