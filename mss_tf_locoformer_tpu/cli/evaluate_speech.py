"""Speech-separation evaluation CLI: per-utterance SI-SNR / SDR / STOI with
PIT-resolved speaker assignment, mean aggregation, ``results.json`` — the
numbers the reference reports for its pretrained models
(``egs2/*/enh1/exp/*/RESULTS.md``, produced there by ESPnet's scorer)."""

from __future__ import annotations

import argparse
import itertools
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate TF-Locoformer speech separator")
    p.add_argument("--config", type=str, required=True,
                   help="Speech-task YAML (configs/speech_*.yaml)")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Orbax checkpoint dir (trainer output) or torch .pth")
    p.add_argument("--data_dir", type=str, default=None,
                   help="Corpus root to evaluate (default: config valid_dir)")
    p.add_argument("--output_dir", type=str, default="./speech_eval")
    p.add_argument("--max_utts", type=int, default=0, help="0 = all")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import numpy as np

    from ..core.config import load_speech_config
    from ..data.speech import SpeechMixtureDataset
    from ..eval.metrics import compute_sdr, compute_si_sdr
    from ..eval.stoi import compute_stoi
    from ..infer.separate import load_speech_separator
    from ..models.espnet_compat import SpeechSeparator
    from ..utils.common import save_json

    cfg = load_speech_config(args.config)
    root = args.data_dir or cfg.dataset.valid_dir or cfg.dataset.root_dir
    ds = SpeechMixtureDataset(root, num_spk=cfg.dataset.num_spk,
                              mix_dir=cfg.dataset.mix_dir,
                              spk_dirs=cfg.dataset.spk_dirs,
                              segment_length=None,
                              sample_rate=cfg.dataset.sample_rate)

    module, params = load_speech_separator(args.checkpoint, cfg)
    pipe = SpeechSeparator(module, params, n_fft=cfg.stft.n_fft,
                           hop_length=cfg.stft.hop_length)
    sr = cfg.dataset.sample_rate
    per_utt = {}
    sums = {"si_snr": 0.0, "sdr": 0.0, "stoi": 0.0}
    n_utts = len(ds) if args.max_utts <= 0 else min(args.max_utts, len(ds))
    for i in range(n_utts):
        item = ds[i]
        mix = item["mixture"].mean(axis=0)            # mono [T]
        refs = item["sources"].mean(axis=1)           # [S, T]
        est = pipe(mix)[0]                            # [S, T]
        s = refs.shape[0]
        # PIT assignment by SI-SNR
        best = max(itertools.permutations(range(s)), key=lambda p: sum(
            compute_si_sdr(est[j], refs[p[j]]) for j in range(s)))
        si = np.mean([compute_si_sdr(est[j], refs[best[j]]) for j in range(s)])
        sd = np.mean([compute_sdr(est[j], refs[best[j]]) for j in range(s)])
        st = np.mean([compute_stoi(refs[best[j]], est[j], sr) for j in range(s)])
        per_utt[item["name"]] = {"si_snr": float(si), "sdr": float(sd),
                                 "stoi": float(st)}
        for k, v in zip(sums, (si, sd, st)):
            sums[k] += float(v)
        print(f"[{i + 1}/{n_utts}] {item['name']}: SI-SNR {si:.2f} dB  "
              f"SDR {sd:.2f} dB  STOI {st:.3f}", flush=True)

    mean = {k: v / max(n_utts, 1) for k, v in sums.items()}
    print(f"MEAN over {n_utts} utts: SI-SNR {mean['si_snr']:.2f} dB  "
          f"SDR {mean['sdr']:.2f} dB  STOI {mean['stoi']:.3f}")
    os.makedirs(args.output_dir, exist_ok=True)
    save_json({"mean": mean, "per_utterance": per_utt},
              os.path.join(args.output_dir, "results.json"))
    print(f"Wrote {os.path.join(args.output_dir, 'results.json')}")


if __name__ == "__main__":
    main()
