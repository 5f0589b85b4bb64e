"""Checkpoint conversion CLI: PyTorch ``.pth`` <-> flax/orbax.

The reference ships PyTorch checkpoints in two layouts (trainer-wrapped
``model_state_dict`` and ESPnet flat ``separator.``-prefixed,
``inference/separate.py:107-110`` / ``README.md:522-531``); this tool
converts either into an orbax params directory for this framework, or
exports a flax checkpoint back to a torch-layout ``.pth`` (loadable by the
reference with ``torch.load``).
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Convert checkpoints torch<->flax")
    p.add_argument("--input", type=str, required=True,
                   help="Source: .pth/.pt (torch) or orbax directory (flax)")
    p.add_argument("--output", type=str, required=True,
                   help="Destination: orbax directory (from torch) or .pth (from flax)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import numpy as np

    from ..convert.torch_ckpt import (convert_state_dict,
                                      load_torch_checkpoint,
                                      params_to_state_dict)

    if args.input.endswith((".pth", ".pt", ".ckpt")):
        params = convert_state_dict(load_torch_checkpoint(args.input))
        import orbax.checkpoint as ocp
        ck = ocp.StandardCheckpointer()
        ck.save(os.path.abspath(args.output), jax.device_get(params), force=True)
        ck.wait_until_finished()
        n = sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(params))
        print(f"torch -> orbax: {n / 1e6:.2f} M params -> {args.output}")
    else:
        import orbax.checkpoint as ocp
        ck = ocp.StandardCheckpointer()
        src = args.input
        if os.path.isdir(os.path.join(src, "state")):
            src = os.path.join(src, "state")
        tree = ck.restore(os.path.abspath(src), None)
        params = tree.get("params", tree) if isinstance(tree, dict) else tree
        state_dict = params_to_state_dict(params)
        import torch
        torch.save({"model_state_dict": {k: torch.from_numpy(np.asarray(v))
                                         for k, v in state_dict.items()}},
                   args.output)
        print(f"flax -> torch: {len(state_dict)} tensors -> {args.output}")


if __name__ == "__main__":
    main()
