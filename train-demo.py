#!/usr/bin/env python
"""Drop-in fractal-training entry point (reference: train-demo.py) —
delegates to the TPU-native fractal engine.  Same flags/defaults as the
reference CLI; see jcfszxc_unet_tpu/cli/train_demo.py."""

from jcfszxc_unet_tpu.cli.train_demo import get_args, main

if __name__ == "__main__":
    main()
