"""Console entry point for training (``diff-vits-train``).

Same surface as the repo-root ``train.py`` (reference train.py:1-5).
"""
from __future__ import annotations

import argparse
import os

from diff_vits_tpu.core.cache import enable_compilation_cache
from diff_vits_tpu.core.config import Config, load_config


def main():
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, default="config.json")
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint path, or 'auto' to continue from "
                             "the newest checkpoint in --workdir (use a "
                             "fixed --workdir for preemption-safe runs)")
    parser.add_argument("--workdir", type=str, default=None,
                        help="fixed run directory (default: a fresh "
                             "timestamped dir under train.logs_folder)")
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--log_every", type=int, default=100)
    args = parser.parse_args()

    from diff_vits_tpu.train.trainer import Trainer

    cfg = load_config(args.config) if os.path.exists(args.config) else Config()
    trainer = Trainer(cfg, workdir=args.workdir)
    if args.resume == "auto":
        trainer.resume_latest()
    elif args.resume:
        trainer.load(args.resume)
    trainer.train(num_steps=args.steps, log_every=args.log_every)


if __name__ == "__main__":
    main()
