"""End-to-end trainer (the reference's ``training/train.py`` re-designed).

Differences from the reference, all deliberate (SURVEY.md §2.4):
  * config keys the reference silently ignored are implemented (betas,
    gradient_clip value, warmup, early stopping, keep_last/save_best);
  * the whole optimizer step is one jitted XLA program; the only per-step
    host sync is the scalar loss for logging (reference syncs every step);
  * ``torch.cuda.empty_cache()`` hygiene has no TPU analogue and is gone;
  * multi-device: batch sharded over the ``dp`` mesh axis, params replicated
    (XLA inserts the grad all-reduce — the DDP/NCCL analogue).

Behavior kept: stereo->mono by channel mean on mixture and targets
(``training/train.py:102-107``), validation on full tracks of the test
subset with batch 1 (``:298-306,321-328``), ReduceLROnPlateau on val loss,
checkpoint every ``save_interval`` + best-model tracking, TensorBoard
scalars for train/val loss and LR.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..core.precision import precision_from_amp
from ..data.loader import DataLoader
from ..data.musdb import MUSDBDataset
from ..models import build_model
from ..parallel import mesh as M
from ..parallel import multihost as MH
from ..utils.common import AverageMeter, count_parameters, format_time, set_seed
from ..utils.profiling import StepProfiler
from .checkpoint import CheckpointManager
from .engine import Scalars, make_writer, run_train_epoch
from .schedule import EarlyStopping
from .state import LRController, TrainState, init_state, make_optimizer
from .step import make_eval_step, make_train_step

__all__ = ["Trainer"]


def _mono(x: np.ndarray) -> np.ndarray:
    """[B, C, T] -> [B, T] channel mean (reference ``training/train.py:102-107``)."""
    if x.ndim == 3:
        return x.mean(axis=1)
    return x


def _stereo(x: np.ndarray) -> np.ndarray:
    """[B, (C,) T] -> [B, 2, T] (stereo BS-Locoformer input; mono tracks are
    duplicated, matching the reference's mono->fake-stereo convention)."""
    if x.ndim == 2:
        x = x[:, None]
    if x.shape[1] == 1:
        x = np.repeat(x, 2, axis=1)
    if x.shape[1] != 2:
        raise ValueError(f"stereo model expects <=2 channels, got {x.shape}")
    return x


class Trainer:
    def __init__(self, config: Config, output_dir: Optional[str] = None,
                 resume: Optional[str] = None, verbose: bool = True):
        self.config = config
        # multi-host: one process per host over a single global mesh; logs,
        # TensorBoard, and profiler traces come from the coordinator only
        # (checkpoint save/restore stays all-process — orbax coordinates)
        self.n_proc = MH.process_count()
        self.verbose = verbose and MH.is_coordinator()
        set_seed(config.seed)

        self.output_dir = output_dir or config.paths.output_dir
        self.ckpt_dir = os.path.join(self.output_dir, "checkpoints")
        self.log_dir = os.path.join(self.output_dir, "logs")
        os.makedirs(self.output_dir, exist_ok=True)
        os.makedirs(self.log_dir, exist_ok=True)

        self.precision = precision_from_amp(config.training.use_amp,
                                            config.training.amp_dtype)
        model_cfg = config.model
        if config.training.gradient_checkpointing and not model_cfg.remat_blocks:
            import dataclasses
            model_cfg = dataclasses.replace(model_cfg, remat_blocks=True)
        self.model = build_model(model_cfg, precision=self.precision)
        # stereo BS-Locoformer keeps both channels; everything else follows
        # the reference's stereo->mono channel mean (training/train.py:102-107)
        self._prep = _stereo if getattr(model_cfg, "stereo", False) else _mono

        tcfg = config.training
        self.tx = make_optimizer(tcfg)
        self.lr_ctl = LRController(tcfg)
        self.early_stop = EarlyStopping(tcfg.early_stopping)
        self.train_step = make_train_step(self.model, config, self.tx)
        self.eval_step = make_eval_step(self.model, config)

        dp, mp = config.mesh.axis_sizes(len(jax.devices()))
        if self.n_proc > 1:
            # pods: every process's devices must join the mesh, and every
            # host must contribute equal dp rows — fail loudly, don't clamp
            if dp * mp != len(jax.devices()):
                raise ValueError(
                    f"multihost mesh {dp}x{mp} must cover all "
                    f"{len(jax.devices())} devices")
            if dp % self.n_proc or tcfg.batch_size % dp:
                raise ValueError(
                    f"multihost: dp={dp} must be divisible by "
                    f"{self.n_proc} processes and batch_size="
                    f"{tcfg.batch_size} by dp")
        else:
            # the global batch must divide over dp; clamp to the largest divisor
            while dp > 1 and tcfg.batch_size % dp != 0:
                dp -= 1
        self.mesh = M.make_mesh(jax.devices()[:dp * mp], dp=dp, mp=mp)
        self.batch_sharding = M.batch_sharding(self.mesh)

        self.ckpt = CheckpointManager(self.ckpt_dir, keep_last=tcfg.keep_last,
                                      save_best=tcfg.save_best)
        self.writer = make_writer(self.log_dir) if MH.is_coordinator() else None
        self._scalars = Scalars(self.writer)
        self.profiler = StepProfiler(
            self.log_dir,
            n_steps=tcfg.profile_steps if MH.is_coordinator() else 0,
            start_step=tcfg.profile_start_step)

        self.state: Optional[TrainState] = None
        self.start_epoch = 0
        self.best_val_loss = float("inf")
        self._resume_from = resume

        self._log(f"Devices: {jax.devices()}  mesh dp={dp} mp={mp}  "
                  f"precision={self.precision.compute_dtype}")

    # ------------------------------------------------------------- plumbing

    def _log(self, msg: str):
        if self.verbose:
            print(msg, flush=True)

    def _scalar(self, tag: str, value: float, step: int):
        self._scalars(tag, value, step)

    def _datasets(self):
        dcfg = self.config.dataset
        train_ds = MUSDBDataset(
            dcfg.root_dir, subset="train", sample_rate=dcfg.sample_rate,
            segment_length=dcfg.segment_length, sources=list(dcfg.sources),
            augmentation=dcfg.augmentation, random_chunks=dcfg.random_chunks,
            min_loudness=dcfg.min_loudness,
            max_chunk_attempts=dcfg.max_chunk_attempts,
            rebuild_mixture=dcfg.rebuild_mixture,
            metadata_cache=dcfg.cache_dir or True,
            precompute_chunks=dcfg.precompute_chunks,
            chunk_hop=dcfg.chunk_hop,
            verbose=self.verbose,
            # decorrelate chunk/augmentation draws across hosts (identity
            # for single-process: process_index() == 0)
            seed=self.config.seed + 7919 * MH.process_index())
        val_ds = MUSDBDataset(
            dcfg.root_dir, subset="test", sample_rate=dcfg.sample_rate,
            segment_length=None, sources=list(dcfg.sources),
            augmentation=False, metadata_cache=dcfg.cache_dir or True,
            verbose=self.verbose)
        return train_ds, val_ds

    def init_model(self, example: np.ndarray) -> TrainState:
        # multihost-safe: init is deterministic in the shared seed (param
        # values depend only on rng + shapes), so every process replicates
        # identical values over the global mesh
        params = self.model.init(jax.random.PRNGKey(self.config.seed), example)
        n = count_parameters(params)
        self._log(f"Model parameters: {n / 1e6:.2f} M")
        state = init_state(params, self.tx)
        return MH.replicate(self.mesh, state)

    # -------------------------------------------------------------- epochs

    def _host_batches(self, loader):
        """Host-side prep: channel layout (mono mean, or kept-stereo for the
        BS stereo lane) fixed in numpy (cheap) so each batch is device_put
        exactly once with the dp sharding — no device->host round trip in
        the hot loop."""
        sources = self.config.dataset.sources
        for batch in iter(loader):
            yield {"mixture": self._prep(np.asarray(batch["mixture"])),
                   **{k: self._prep(np.asarray(batch[k]))
                      for k in sources if k in batch}}

    def train_epoch(self, state, loader, epoch: int, rng):
        tcfg = self.config.training

        def step(st, batch, lr, sub):
            b = dict(batch)
            mixture = b.pop("mixture")  # already sharded on device
            return self.train_step(st, mixture, b, lr, sub)

        return run_train_epoch(
            step, state, self._host_batches(loader),
            sharding=self.batch_sharding, prefetch=tcfg.prefetch_factor,
            lr_ctl=self.lr_ctl, rng=rng, profiler=self.profiler, epoch=epoch,
            log_interval=tcfg.log_interval, log=self._log,
            scalars=self._scalars)

    def validate(self, state, loader) -> float:
        with M.activate_mesh(self.mesh):
            return self._validate(state, loader)

    def _validate(self, state, loader) -> float:
        """Chunked validation: every track is cut into fixed-length
        non-overlapping segments and scored in fixed-size groups, so at most
        two XLA programs (full group + one ragged tail group) serve the whole
        set regardless of track lengths — memory-bounded, no per-track-length
        recompiles (the reference validates full tracks, its OOM hazard).

        Pods: val tracks are round-robin SHARDED over processes (tails
        included — every chunk scores on this process's local devices only,
        so unequal shard sizes cannot desynchronize a collective) and ONE
        allgather merges the (sum, weight) meters; every process computes
        the identical global weighted mean, so plateau / early-stop / best
        decisions stay bit-identical while per-process validation wall-clock
        drops ~process_count-fold (round-3 validation was fully replicated).
        """
        tcfg = self.config.training
        seg = (tcfg.val_segment_length or self.config.dataset.segment_length
               or 10 * self.config.dataset.sample_rate)
        group = max(1, tcfg.val_batch_size)
        meter = AverageMeter()
        buf_mix, buf_tgt, buf_w = [], [], []
        rank, world = MH.process_index(), self.n_proc
        params = state.params
        if world > 1:
            # local-device eval: materialize the (fully replicated) global
            # params on this host — a jit over global arrays would be a
            # collective program every process must enter in lockstep,
            # which unequal track shards cannot guarantee
            params = jax.device_get(state.params)
        self._val_steps = 0  # eval-step programs this process ran (tests)

        def flush():
            if not buf_mix:
                return
            mixture = np.stack(buf_mix)
            targets = {k: np.stack([t[k] for t in buf_tgt])
                       for k in buf_tgt[0]}
            # per-chunk weighting happens INSIDE the eval step (weighted
            # mean of per-sample losses) — a batch-mean rescaled on the
            # host would give a mostly-padding tail a full 1/group share
            ld = self.eval_step(params, mixture, targets,
                                weights=np.asarray(buf_w, np.float32))
            meter.update(float(ld["total_loss"]), sum(buf_w))
            self._val_steps += 1
            buf_mix.clear()
            buf_tgt.clear()
            buf_w.clear()

        def _tail_pad(x, valid):
            # zero-pad the LAST (time) axis to seg; works for [T] and [2, T]
            if valid == seg:
                return x
            pad = [(0, 0)] * (x.ndim - 1) + [(0, seg - valid)]
            return np.pad(x, pad)

        for ti, batch in enumerate(iter(loader)):
            if world > 1 and ti % world != rank:
                continue  # another process's shard (val loader is bs=1)
            mixture = self._prep(np.asarray(batch["mixture"]))
            targets = {k: self._prep(np.asarray(batch[k]))
                       for k in self.config.dataset.sources if k in batch}
            t = mixture.shape[-1]
            # ceil: the final partial chunk is zero-padded, not dropped —
            # every track contributes its full length to the val loss, and
            # the meter weights each chunk by its valid-sample fraction.
            n_chunks = max(1, -(-t // seg))
            for b in range(mixture.shape[0]):
                for c in range(n_chunks):
                    sl = slice(c * seg, (c + 1) * seg)
                    mix_c = mixture[b][..., sl]
                    valid = mix_c.shape[-1]
                    buf_mix.append(_tail_pad(mix_c, valid))
                    buf_tgt.append({k: _tail_pad(v[b][..., sl],
                                                 v[b][..., sl].shape[-1])
                                    for k, v in targets.items()})
                    buf_w.append(valid / seg)
                    if len(buf_mix) == group:
                        flush()
        flush()  # ragged tail group (one extra program shape at most)
        if world > 1:
            from jax.experimental import multihost_utils
            merged = np.asarray(multihost_utils.process_allgather(
                np.array([meter.sum, meter.count], np.float64)))
            total, weight = merged.sum(axis=0)
            return float(total / max(weight, 1e-12))
        return meter.avg

    # ---------------------------------------------------------------- main

    def fit(self, train_loader=None, val_loader=None) -> TrainState:
        # re-assert THIS trainer's mesh for every trace in the fit scope —
        # the module-global gate set by make_mesh is last-call-wins
        # (parallel/mesh.py:activate_mesh)
        with M.activate_mesh(self.mesh):
            return self._fit(train_loader, val_loader)

    def _fit(self, train_loader=None, val_loader=None) -> TrainState:
        tcfg = self.config.training
        if train_loader is None:
            train_ds, val_ds = self._datasets()
            # multihost: each process loads its 1/n_proc share of the global
            # batch from its own round-robin shard of the track list (the
            # DDP-sampler analogue); validation is SHARDED too — see
            # _validate (one allgather keeps decisions bit-identical)
            train_loader = DataLoader(
                train_ds, batch_size=MH.local_batch_size(tcfg.batch_size),
                shuffle=True, num_workers=tcfg.num_workers,
                prefetch_factor=tcfg.prefetch_factor,
                seed=self.config.seed, drop_last=self.n_proc > 1,
                shard=((MH.process_index(), self.n_proc)
                       if self.n_proc > 1 else None))
            val_loader = DataLoader(val_ds, batch_size=1, shuffle=False,
                                    num_workers=min(2, tcfg.num_workers))

        first = next(iter(train_loader))
        example = self._prep(np.asarray(first["mixture"]))[:1]
        state = self.init_model(example)

        if self._resume_from:
            state, meta, epoch = self.ckpt.restore(state)
            self.start_epoch = epoch + 1
            self.best_val_loss = meta.get("best_val_loss", float("inf"))
            self.lr_ctl.load_state_dict(meta["lr_controller"])
            if "early_stop" in meta:
                self.early_stop.load_state_dict(meta["early_stop"])
            self._log(f"Resumed from epoch {epoch}")

        rng = jax.random.PRNGKey(self.config.seed + 1)
        for epoch in range(self.start_epoch, tcfg.num_epochs):
            t0 = time.time()
            state, train_loss, rng = self.train_epoch(state, train_loader,
                                                      epoch, rng)
            self._scalar("train/loss_epoch", train_loss, epoch)
            msg = (f"epoch {epoch}: train {train_loss:.4f} "
                   f"({format_time(time.time() - t0)})")

            val_loss = None
            if (epoch + 1) % tcfg.val_interval == 0:
                val_loss = self.validate(state, val_loader)
                self._scalar("val/loss", val_loss, epoch)
                self.lr_ctl.on_validation(val_loss)
                msg += f" val {val_loss:.4f}"
            self._log(msg)

            is_best = val_loss is not None and val_loss < self.best_val_loss
            if is_best:
                self.best_val_loss = val_loss
            if (epoch + 1) % tcfg.save_interval == 0 or is_best:
                self.ckpt.save(epoch, state, {
                    "epoch": epoch,
                    "train_loss": train_loss,
                    "val_loss": val_loss,
                    "best_val_loss": self.best_val_loss,
                    "lr_controller": self.lr_ctl.state_dict(),
                    "early_stop": self.early_stop.state_dict(),
                }, is_best=is_best)

            if val_loss is not None and self.early_stop.step(val_loss):
                self._log(f"Early stopping at epoch {epoch}")
                break

        self.state = state
        self.profiler.close()
        stats = self.profiler.stats()
        if stats:
            self._log("step time: " + "  ".join(
                f"{k}={v:.4g}" for k, v in stats.items()))
        if self.writer is not None:
            self.writer.close()
        return state
