"""Convert a reference diff-vits checkpoint into this framework's format.

The reference Trainer saves ``{'step': int, 'model': state_dict}`` .pt
files (model3.py:1326-1333); this CLI transplants every weight
(utils/transplant.py — conv/linear layout swaps, weight-norm collapse)
into our parameter tree and writes a ``model-<step>.ckpt`` loadable by
``tts_infer`` and ``train.py --resume`` (optimizer state starts fresh,
exactly like the reference's own resume, which never saved it —
SURVEY.md §7.4).

Usage:
    python -m diff_vits_tpu.utils.convert \
        --ref_ckpt logs/tts/<run>/model-804000.pt \
        -c config.json --out_dir converted/
"""
from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ref_ckpt", type=str, required=True,
                        help="reference model-<step>.pt (torch)")
    parser.add_argument("-c", "--config_path", type=str,
                        default="config.json")
    parser.add_argument("--out_dir", type=str, default="converted")
    args = parser.parse_args()

    import torch

    from diff_vits_tpu.core.config import load_config, Config
    from diff_vits_tpu.train import checkpoint as ckpt_lib
    from diff_vits_tpu.utils.transplant import diff_vits_params_from_config

    cfg = (load_config(args.config_path)
           if os.path.exists(args.config_path) else Config())
    blob = torch.load(args.ref_ckpt, map_location="cpu", weights_only=True)
    step = int(blob.get("step", 0)) if isinstance(blob, dict) else 0
    state = blob["model"] if isinstance(blob, dict) and "model" in blob \
        else blob
    # tolerate DDP/accelerate "module." prefixes (unwrapped saves lack them)
    state = {k.removeprefix("module."): v for k, v in state.items()}

    params = diff_vits_params_from_config(state, cfg)
    path = ckpt_lib.save_checkpoint(args.out_dir, step, {"params": params},
                                    keep=0)
    n = sum(v.size for v in __import__("jax").tree_util.tree_leaves(params))
    print(f"converted {args.ref_ckpt} (step {step}, {n/1e6:.1f}M params) "
          f"-> {path}")


if __name__ == "__main__":
    main()
