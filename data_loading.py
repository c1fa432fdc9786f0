#!/usr/bin/env python
"""Drop-in data-loading module (reference: data_loading.py) — re-exports the
framework loaders/visualizers."""

from jcfszxc_unet_tpu.data.loading import (  # noqa: F401
    display_dataset_info,
    load_preprocessed_data,
    visualize_samples,
)
