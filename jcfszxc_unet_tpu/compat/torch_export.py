"""Export framework checkpoints to PyTorch ``.pth`` state_dicts — the
inverse of compat/torch_import.py, completing two-way checkpoint
interchange with the reference.

A user who trained here can hand the result back to the reference's torch
tooling:

    model = UNetFamily.UNet.UNet(3, 1)          # the reference class
    model.load_state_dict(torch.load("exported.pth"))

(The reference itself pickles whole modules — train.py:374 — but
``load_state_dict`` is the standard torch interchange and needs no pickled
class identity; we cannot ship the reference's classes.)  Models with dead
reference parameters (EXPECTED_UNUSED, e.g. FRUNet's unused ``fuse`` head,
FRUNet.py:105) need ``strict=False``; every parameter the forward reads is
present.

CLI:  python -m jcfszxc_unet_tpu.compat.torch_export \
          --ckpt best_model.ckpt --out best_model.pth
"""

from __future__ import annotations

import argparse


def export_torch_state_dict(model_name: str, variables, out_path: str) -> str:
    """Write ``variables`` as a torch state_dict ``.pth`` for ``model_name``
    (registry spelling, e.g. "UNet.UNet")."""
    import torch

    from jcfszxc_unet_tpu.compat.torch_mapping import variables_to_state_dict

    sd = variables_to_state_dict(model_name, variables)
    # jax-backed leaves arrive as read-only numpy views; torch tensors
    # require writable backing stores.
    torch.save({k: torch.from_numpy(v if v.flags.writeable else v.copy())
                for k, v in sd.items()}, out_path)
    return out_path


def export_torch_checkpoint(ckpt_path: str, out_path: str) -> str:
    """Framework single-file checkpoint -> torch state_dict ``.pth``."""
    from jcfszxc_unet_tpu.train.checkpoint import load_model

    _, variables, config = load_model(ckpt_path)
    return export_torch_state_dict(config["model_name"], variables, out_path)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Convert a framework checkpoint into a PyTorch "
                    "state_dict .pth consumable by the reference's model "
                    "classes via load_state_dict")
    p.add_argument("--ckpt", required=True, help="input .ckpt path")
    p.add_argument("--out", required=True, help="output .pth path")
    args = p.parse_args(argv)
    out = export_torch_checkpoint(args.ckpt, args.out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
