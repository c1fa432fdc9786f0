"""jcfszxc_unet_tpu — a TPU-native (JAX/XLA/Pallas) retinal-vessel segmentation
framework with the capabilities of the PyTorch reference jcfszxc/jcfszxc-UNet.

Layout is NHWC throughout (TPU-native), parameters are float32 with optional
bfloat16 compute, and all hot paths (patch sampling, train step, tiled
inference + stitching, metrics) run on-device under ``jax.jit`` / ``pjit``.

Subpackages
-----------
ops/       block library (Flax modules mirroring the reference's
           ``UNetFamily/utils/unet_parts.py`` semantics) + Pallas TPU kernels
models/    16 model classes, same public names/ctor signatures as the
           reference ``UNetFamily/*.py``
data/      DRIVE preprocessing (schema-identical h5), on-device patch sampler
train/     losses, optimizer chain, train engine, checkpointing
eval/      tiled inference, stitching, metrics (Dice/AUC), visualization
parallel/  device mesh + sharding helpers (DP over ICI)
utils/     seeding, visualization, profiling
"""

__version__ = "0.1.0"
