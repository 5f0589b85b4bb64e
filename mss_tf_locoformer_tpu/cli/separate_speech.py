"""Speech separation CLI: mixture WAV(s) -> per-speaker WAVs.

The reference serves its speech models through ESPnet's ``SeparateSpeech``
(``egs2/wsj0_2mix/enh1/separate.py``): std-normalize, STFT, separator,
iSTFT, de-normalize, one output file per speaker.  This is the standalone
TPU-native equivalent over ``models/espnet_compat.SpeechSeparator`` —
checkpoints load from the trainer's orbax dirs or the reference's
pretrained ``.pth`` layouts (``infer/separate.load_speech_separator``).

XLA wants static shapes, so inputs are zero-padded up to a length bucket
(default 1 s granularity) before the jitted pipeline and cropped after —
a directory of utterances compiles one program per occupied bucket, not
one per file.
"""

from __future__ import annotations

import argparse
import glob
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Separate speech mixtures into per-speaker WAVs")
    p.add_argument("--config", type=str, required=True,
                   help="Speech-task YAML (configs/speech_*.yaml)")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Orbax checkpoint dir (trainer output) or torch .pth")
    p.add_argument("--input", type=str, required=True,
                   help="Mixture WAV/FLAC, or a directory of them")
    p.add_argument("--output_dir", type=str, default="./separated_speech")
    p.add_argument("--bucket_seconds", type=float, default=1.0,
                   help="Pad inputs up to this granularity (static-shape "
                        "bucketing; 0 = one XLA program per distinct length)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import numpy as np

    from ..core.config import load_speech_config
    from ..infer.separate import load_speech_separator
    from ..models.espnet_compat import SpeechSeparator
    from ..utils.audio import load_audio, save_audio

    cfg = load_speech_config(args.config)
    sr = cfg.dataset.sample_rate
    module, params = load_speech_separator(args.checkpoint, cfg)
    pipe = SpeechSeparator(module, params, n_fft=cfg.stft.n_fft,
                           hop_length=cfg.stft.hop_length)

    if os.path.isdir(args.input):
        exts = ("wav", "flac", "WAV", "FLAC")
        paths = sorted(p for e in exts
                       for p in glob.glob(os.path.join(args.input, f"*.{e}")))
        if not paths:
            raise FileNotFoundError(f"No audio files in {args.input}")
    else:
        paths = [args.input]

    bucket = max(0, int(args.bucket_seconds * sr))
    os.makedirs(args.output_dir, exist_ok=True)
    for i, path in enumerate(paths):
        audio, _ = load_audio(path, sample_rate=sr, mono=True)
        mix = audio[0]
        t = mix.shape[0]
        if bucket:
            padded_t = max(bucket, -(-t // bucket) * bucket)
            mix = np.pad(mix, (0, padded_t - t))
        est = pipe(mix)[0][:, :t]                        # [S, T]
        base = os.path.splitext(os.path.basename(path))[0]
        outs = []
        for s in range(est.shape[0]):
            out = os.path.join(args.output_dir, f"{base}_spk{s + 1}.wav")
            # no peak normalization: SpeechSeparator already restored the
            # input scale, and PIT evaluation compares absolute signals
            save_audio(out, est[s], sr, normalize=False)
            outs.append(out)
        print(f"[{i + 1}/{len(paths)}] {base}: wrote {len(outs)} speakers "
              f"to {args.output_dir}", flush=True)


if __name__ == "__main__":
    main()
