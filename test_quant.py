#!/usr/bin/env python
"""Reference-compatible entry point (same flags as the upstream test_quant.py).

    python test_quant.py --model deit_small --config ./configs/4bit.py \
        --dataset /path/to/imagenet --calibrate [--optimize]
"""

from adalog_tpu.cli import run

if __name__ == "__main__":
    run()
