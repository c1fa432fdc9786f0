#!/usr/bin/env python
"""Drop-in preprocessing entry point (reference: preprocess.py) — delegates
to jcfszxc_unet_tpu/cli/preprocess.py (schema-identical h5 output)."""

from jcfszxc_unet_tpu.cli.preprocess import main

if __name__ == "__main__":
    main()
