"""Speech-separation training CLI (TPU-native counterpart of the reference's
ESPnet recipes, ``egs2/*/enh1/run.sh`` stage 6)."""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Train TF-Locoformer speech separator (TPU)")
    p.add_argument("--config", type=str, required=True,
                   help="Speech-task YAML (configs/speech_*.yaml)")
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--resume", type=str, default=None)
    from .train import add_distributed_args
    add_distributed_args(p)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from .train import maybe_init_distributed
    maybe_init_distributed(args)
    from ..core.config import load_speech_config
    from ..train.speech import SpeechTrainer

    config = load_speech_config(args.config)
    trainer = SpeechTrainer(config, output_dir=args.output_dir,
                            resume=args.resume)
    trainer.fit()


if __name__ == "__main__":
    main()
