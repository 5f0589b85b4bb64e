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
    add_distributed_args(p)
    return p.parse_args(argv)


def add_distributed_args(p):
    """Multi-host flags shared by both training CLIs.  On real TPU pods
    ``--distributed`` alone suffices (coordinator auto-detected from the
    pod metadata); explicit flags drive ad-hoc clusters."""
    p.add_argument("--distributed", action="store_true",
                   help="Initialize multi-host JAX (one process per host)")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 (omit on TPU pods)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)


def maybe_init_distributed(args):
    if args.distributed or args.coordinator_address is not None:
        from ..parallel.multihost import initialize
        initialize(coordinator_address=args.coordinator_address,
                   num_processes=args.num_processes,
                   process_id=args.process_id)
    elif args.num_processes is not None or args.process_id is not None:
        # rank flags without --distributed/--coordinator_address would
        # otherwise silently run N INDEPENDENT single-process jobs against
        # the same output_dir
        raise SystemExit(
            "--num_processes/--process_id require --distributed "
            "(TPU pod auto-detection) or --coordinator_address host:port")


def main(argv=None):
    args = parse_args(argv)
    maybe_init_distributed(args)
    from ..core.config import load_config
    from ..train.loop import Trainer

    config = load_config(args.config)
    if args.gpu is not None:
        print("NOTE: --gpu is ignored on TPU; devices are auto-discovered.")
    trainer = Trainer(config, output_dir=args.output_dir, resume=args.resume)
    trainer.fit()


if __name__ == "__main__":
    main()
