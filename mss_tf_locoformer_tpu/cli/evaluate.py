"""Evaluation CLI, mirroring ``evaluation/evaluate.py`` of the reference:
full-track test-subset evaluation with per-stem SI-SDR/SDR/SAR/SIR, mean
aggregation, optional stem saving, ``results.json``.

Divergence fixed consciously: targets are mono-ized like the mixture (the
reference compares mono estimates against stereo targets — SURVEY.md §2.5).

Beyond the reference: ``--distributed`` shards the track list across
multi-host JAX processes (round-robin, tails included — per-track
separation runs on each process's LOCAL devices only, so unequal shard
sizes cannot desynchronize any collective).  Partial results land in
``output_dir`` (shared filesystem, as for checkpoints), one barrier
synchronizes, and the coordinator merges them into the single
``results.json`` a single-process run would have written.
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate TF-Locoformer MSS (TPU)")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="./evaluation_results")
    p.add_argument("--save_audio", action="store_true")
    p.add_argument("--device", type=str, default=None, help="Ignored on TPU")
    p.add_argument("--chunk_seconds", type=float, default=8.0)
    p.add_argument("--overlap_seconds", type=float, default=1.0)
    p.add_argument("--batch_size", type=int, default=2)  # fits 16 GB HBM (bf16)
    p.add_argument("--bss_eval", action="store_true",
                   help="Also compute true BSS Eval v3 SDR/SIR/SAR "
                        "(512-tap multi-source decomposition) per track")
    p.add_argument("--bss_filter_len", type=int, default=512)
    from .train import add_distributed_args
    add_distributed_args(p)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from .train import maybe_init_distributed
    maybe_init_distributed(args)
    import numpy as np

    from ..core.config import load_config
    from ..data.musdb import MUSDBDataset
    from ..eval.metrics import evaluate_source_separation, print_metrics
    from ..infer.separate import load_model, make_engine
    from ..utils.audio import save_audio
    from ..utils.common import save_json

    config = load_config(args.config)
    model, params, mcfg = load_model(args.checkpoint, args.config)
    dcfg = config.dataset

    ds = MUSDBDataset(dcfg.root_dir, subset="test", sample_rate=dcfg.sample_rate,
                      segment_length=None, sources=list(dcfg.sources),
                      return_metadata=True, verbose=True)
    engine = make_engine(model, params, chunk_seconds=args.chunk_seconds,
                         overlap_seconds=args.overlap_seconds,
                         sample_rate=dcfg.sample_rate,
                         batch_size=args.batch_size)

    from ..parallel import multihost as MH
    rank, world = MH.process_index(), MH.process_count()

    os.makedirs(args.output_dir, exist_ok=True)
    per_track = {}
    # round-robin track shard, tails INCLUDED: each track separates on this
    # process's local devices alone, so unequal shard sizes are safe here
    # (unlike training, where they would desynchronize per-step collectives)
    for i in range(rank, len(ds), world):
        sample = ds[i]
        name = sample.get("track_name", f"track{i}")
        if getattr(mcfg, "stereo", False):
            # stereo BS-Locoformer lane: score true stereo stems
            def _prep(x):
                x = np.asarray(x)
                return np.repeat(x, 2, axis=0) if x.shape[0] == 1 else x[:2]
        else:
            def _prep(x):
                return np.asarray(x).mean(axis=0)  # stereo -> mono
        mixture = _prep(sample["mixture"])
        targets = {k: _prep(sample[k]) for k in dcfg.sources if k in sample}
        stems = engine(mixture)
        res = evaluate_source_separation(stems, targets,
                                         metrics=config.evaluation.metrics)
        if args.bss_eval:
            from ..eval.bss_eval import bss_eval_stems
            bss = bss_eval_stems(stems, targets,
                                 filter_len=args.bss_filter_len)
            for stem, vals in bss.items():
                res.setdefault(stem, {}).update(
                    {f"bss_{m}": v for m, v in vals.items()})
        per_track[name] = res
        print(f"[{i + 1}/{len(ds)}] {name}: "
              f"SI-SDR {res['average']['si_sdr']:.2f} dB")
        if args.save_audio:
            tdir = os.path.join(args.output_dir, name)
            os.makedirs(tdir, exist_ok=True)
            for stem, est in stems.items():
                out = est if est.ndim == 2 else np.stack([est, est])
                save_audio(os.path.join(tdir, f"{stem}.wav"),
                           out, dcfg.sample_rate)

    if world > 1:
        # shared-filesystem gather (the same contract orbax checkpointing
        # already requires): write the shard, barrier, coordinator merges
        from jax.experimental import multihost_utils
        shard_path = os.path.join(args.output_dir, f"_partial_rank{rank}.json")
        save_json(per_track, shard_path)
        multihost_utils.sync_global_devices("evaluate_gather")
        if rank == 0:
            import json
            per_track = {}
            for r in range(world):
                p = os.path.join(args.output_dir, f"_partial_rank{r}.json")
                with open(p) as f:
                    per_track.update(json.load(f))
                os.remove(p)

    if rank == 0:
        stems_seen = sorted({s for r in per_track.values() for s in r})
        summary = {}
        for s in stems_seen:
            names = sorted({m for r in per_track.values()
                            for m in r.get(s, {})})
            summary[s] = {
                m: float(np.mean([r[s][m] for r in per_track.values()
                                  if s in r and m in r[s]]))
                for m in names}
        print("\n=== mean over tracks ===")
        print_metrics(summary)
        save_json({"per_track": per_track, "summary": summary},
                  os.path.join(args.output_dir, "results.json"))
        print(f"Wrote {os.path.join(args.output_dir, 'results.json')}")

    if world > 1:
        # second barrier AFTER the coordinator's write: no rank (nor any
        # per-host automation sequenced after it) observes completion
        # before results.json exists
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("evaluate_done")


if __name__ == "__main__":
    main()
