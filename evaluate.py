#!/usr/bin/env python
"""Drop-in evaluation entry point (reference: evaluate.py) — delegates to
the TPU-native tiled-inference engine; see
jcfszxc_unet_tpu/cli/evaluate.py."""

from jcfszxc_unet_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
