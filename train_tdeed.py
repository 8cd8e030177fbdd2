#!/usr/bin/env python3
"""Reference-compatible launcher: ``python train_tdeed.py --model <cfg>``."""

from tdeed_tpu.cli.train import main

if __name__ == "__main__":
    main()
