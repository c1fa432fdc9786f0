"""Environment-compat layer for executing the UNMODIFIED reference scripts
(/root/reference/train.py, evaluate.py) under this image's torch 2.13.

The reference was written against torch<=2.1 APIs; two of them changed in
ways that crash it before any training happens.  This sitecustomize (first
on PYTHONPATH for the reference runs ONLY) restores the old behavior at
the interpreter level so the reference code itself runs byte-unmodified:

1. ``ReduceLROnPlateau(verbose=True)`` (reference train.py:114-122):
   torch 2.13 removed the ``verbose`` kwarg -> TypeError.  Wrap __init__
   to accept-and-drop it (exactly what torch<=2.1 did apart from the
   print).

2. ``torch.load(path)`` of a whole pickled nn.Module (reference
   train.py:502, evaluate.py:421): torch>=2.6 defaults
   ``weights_only=True`` which rejects pickled modules.  Set
   TORCH_FORCE_NO_WEIGHTS_ONLY_LOAD=1 (torch's own escape hatch) before
   torch import.

Used by scripts/ref_ab/run_ab.py; see experiments_record.md for the A/B
protocol these runs feed.
"""

import os

os.environ.setdefault("TORCH_FORCE_NO_WEIGHTS_ONLY_LOAD", "1")

try:
    import torch.optim.lr_scheduler as _sched

    _orig_init = _sched.ReduceLROnPlateau.__init__

    def _init(self, *args, **kwargs):
        kwargs.pop("verbose", None)  # torch<=2.1 compat
        _orig_init(self, *args, **kwargs)

    _sched.ReduceLROnPlateau.__init__ = _init
except Exception:
    pass
