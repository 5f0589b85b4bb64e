"""Training CLI, mirroring the reference's surface
(``training/train.py:37-65``): ``--config`` (required), ``--output_dir``,
``--resume``; ``--gpu`` is accepted and ignored (device selection is
implicit on TPU)."""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train TF-Locoformer MSS (TPU)")
    p.add_argument("--config", type=str, required=True, help="Path to YAML config")
    p.add_argument("--output_dir", type=str, default=None,
                   help="Output directory (overrides config paths)")
    p.add_argument("--resume", type=str, default=None,
                   help="Checkpoint directory to resume from")
    p.add_argument("--gpu", type=int, default=None,
                   help="Ignored (TPU devices are auto-discovered)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ..core.config import load_config
    from ..train.loop import Trainer

    config = load_config(args.config)
    if args.gpu is not None:
        print("NOTE: --gpu is ignored on TPU; devices are auto-discovered.")
    trainer = Trainer(config, output_dir=args.output_dir, resume=args.resume)
    trainer.fit()


if __name__ == "__main__":
    main()
