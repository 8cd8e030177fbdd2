#!/usr/bin/env python3
"""Reference-compatible launcher for SNB challenge inference."""

from tdeed_tpu.cli.evaluate_challenge import main

if __name__ == "__main__":
    main()
