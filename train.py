#!/usr/bin/env python
"""Drop-in training entry point (reference: train.py) — delegates to the
TPU-native engine.  Same flags/defaults as the reference CLI, plus
``--model`` (registry-backed) and TPU extras; see
jcfszxc_unet_tpu/cli/train.py."""

from jcfszxc_unet_tpu.cli.train import main

if __name__ == "__main__":
    main()
