"""Convert a reference PyTorch checkpoint into our framework format.

Takes the torch ``{'step', 'model': state_dict}`` file the reference Trainer
writes (model3.py:1326-1333) and produces a ``model-<step>.ckpt`` loadable by
our Trainer / tts_infer (params only; optimizer state restarts, exactly like
the reference's own resume).

Usage:
  python -m diff_vits_tpu.utils.convert_checkpoint \
      --in logs/tts/<run>/model-172.pt --out_dir logs/tts/converted
"""
from __future__ import annotations

import argparse
import os


def convert(in_path: str, out_dir: str):
    import torch
    from diff_vits_tpu.train import checkpoint as ckpt_lib
    from diff_vits_tpu.utils import transplant as tp

    data = torch.load(in_path, map_location="cpu")
    step = int(data.get("step", 0))
    state = data["model"]
    params = tp.diff_vits_params(state)
    os.makedirs(out_dir, exist_ok=True)
    path = ckpt_lib.save_checkpoint(out_dir, step, {"params": params},
                                    keep=0)
    print(f"converted {in_path} (step {step}) -> {path}")
    return path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--in", dest="in_path", required=True)
    parser.add_argument("--out_dir", required=True)
    args = parser.parse_args()
    convert(args.in_path, args.out_dir)


if __name__ == "__main__":
    main()
