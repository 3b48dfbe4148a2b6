"""Training entry point. Parity: train.py:1-5 of the reference."""
from diff_vits_tpu.train.cli import main

if __name__ == "__main__":
    main()
