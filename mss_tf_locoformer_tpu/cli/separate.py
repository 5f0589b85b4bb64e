"""Separation CLI, mirroring ``inference/separate.py`` of the reference
(same flags; ``--device`` accepted/ignored; chunked OLA extras added)."""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Separate music sources using TF-Locoformer (TPU)")
    p.add_argument("--input", type=str, required=True, help="Input audio file")
    p.add_argument("--output_dir", type=str, default="./separated")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Checkpoint: orbax dir or PyTorch .pth")
    p.add_argument("--config", type=str, default=None, help="Optional YAML config")
    p.add_argument("--device", type=str, default=None, help="Ignored on TPU")
    p.add_argument("--sample_rate", type=int, default=44100)
    p.add_argument("--seed", type=int, default=42)
    # chunked-OLA controls (TPU replaces the reference's full-track forward)
    p.add_argument("--chunk_seconds", type=float, default=8.0)
    p.add_argument("--overlap_seconds", type=float, default=1.0)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--precision", type=str, default="bf16",
                   choices=("bf16", "fp32"),
                   help="Compute precision (fp32 = reference bit-parity path; "
                        "bf16 = TPU-native default, fp32 islands preserved)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ..core.precision import BF16, FP32
    from ..infer.separate import load_model, separate_audio
    from ..utils.common import set_seed

    set_seed(args.seed)
    precision = FP32 if args.precision == "fp32" else BF16
    model, params, _ = load_model(args.checkpoint, args.config, precision=precision)
    stems = separate_audio(
        args.input, args.output_dir, model, params,
        sample_rate=args.sample_rate, chunk_seconds=args.chunk_seconds,
        overlap_seconds=args.overlap_seconds, batch_size=args.batch_size)
    print(f"Saved {len(stems)} stems to {args.output_dir}")


if __name__ == "__main__":
    main()
