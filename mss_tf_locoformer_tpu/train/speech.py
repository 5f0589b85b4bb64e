"""Speech-separation training (the reference delegates this to external
ESPnet recipes, ``egs2/*/enh1/``; here it is a first-class TPU path).

Pipeline per jitted step (mirrors the recipe stack, ``egs2/wsj0_2mix/enh1/
conf/tuning/train_enh_tflocoformer.yaml``): STFT encoder (n_fft 128/hop 64 at
8 kHz) -> ``TFLocoformerSeparator`` (spec -> spec) -> iSTFT decoder -> PIT
SI-SNR (or fixed-order multi-resolution TF L1, the DNS criterion).  Warmup +
ReduceLROnPlateau matches the recipes' ``warmupreducelronplateau``.

Batch is sharded over the ``dp`` mesh axis like the MSS trainer (the
XLA-collectives answer to the recipes' 4-GPU NCCL DDP).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SpeechConfig
from ..core.precision import precision_from_amp
from ..data.loader import DataLoader
from ..data.speech import SpeechMixtureDataset
from ..losses.pit import fixed_order_loss, mr_l1_tfd_loss, pit_si_snr_loss
from ..models.tflocoformer import TFLocoformerSeparator
from ..ops.stft import istft, stft
from ..parallel import mesh as M
from ..parallel import multihost as MH
from ..utils.common import AverageMeter, count_parameters, format_time, set_seed
from ..utils.profiling import StepProfiler
from .checkpoint import CheckpointManager
from .engine import Scalars, make_writer, run_train_epoch
from .schedule import EarlyStopping
from .state import LRController, TrainState, init_state, make_optimizer
from .step import make_update_step

__all__ = ["SpeechTrainer", "make_speech_step"]


def _mr_l1_per_item(est: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Per-item ([B]) multi-resolution TF-domain L1 (PIT-compatible)."""
    from ..ops.stft import stft as _stft
    est = est.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    fft_sizes = (256, 512, 768, 1024)
    total = 0.0
    for n_fft in fft_sizes:
        hop = n_fft // 2
        e = jnp.abs(_stft(est, n_fft, hop))
        r = jnp.abs(_stft(ref, n_fft, hop))
        total = total + jnp.mean(jnp.abs(e - r), axis=(-2, -1))
    return total / len(fft_sizes) + 0.5 * jnp.mean(jnp.abs(est - ref), axis=-1)


def _criterion(cfg: SpeechConfig):
    from ..losses.pit import pit_loss
    crit, wrap = cfg.loss.criterion, cfg.loss.wrapper
    if wrap == "pit":
        if crit == "si_snr":
            return pit_si_snr_loss
        return lambda est, src: pit_loss(est, src, _mr_l1_per_item)[0]
    if crit == "si_snr":
        return fixed_order_loss
    return lambda est, src: fixed_order_loss(est, src, _mr_l1_per_item)


def make_speech_step(module: TFLocoformerSeparator, cfg: SpeechConfig, tx):
    """Jitted ``step(state, mixture [B,T], sources [B,S,T], lr, rng) ->
    (state, loss_dict)`` sharing :func:`make_update_step` with the MSS
    trainer: one clip (inside the optax chain), scan-based grad accumulation,
    identical loss-dict contract."""
    n_fft, hop = cfg.stft.n_fft, cfg.stft.hop_length
    loss_of = _criterion(cfg)

    def loss_fn(params, mixture, sources, rng, train):
        t = mixture.shape[-1]
        spec = jnp.swapaxes(stft(mixture, n_fft, hop), -1, -2)  # [B, N, F]
        out = module.apply(params, spec, deterministic=not train,
                           rngs={"dropout": rng} if train else None)
        est = istft(jnp.swapaxes(out, -1, -2), n_fft, hop, length=t)  # [B,S,T]
        loss = loss_of(est, sources)
        return loss, {"total_loss": loss}

    step = make_update_step(loss_fn, tx,
                            cfg.training.gradient_accumulation_steps)

    @jax.jit
    def eval_step(params, mixture, sources):
        loss, _ = loss_fn(params, mixture, sources, jax.random.PRNGKey(0), False)
        return loss

    return step, eval_step


class SpeechTrainer:
    """Epoch-driven trainer over a ``SpeechMixtureDataset`` corpus."""

    def __init__(self, config: SpeechConfig, output_dir: Optional[str] = None,
                 resume: Optional[str] = None, verbose: bool = True):
        self.config = config
        self.n_proc = MH.process_count()
        self.verbose = verbose and MH.is_coordinator()
        set_seed(config.seed)

        self.output_dir = output_dir or config.paths.output_dir
        self.ckpt_dir = os.path.join(self.output_dir, "checkpoints")
        self.log_dir = os.path.join(self.output_dir, "logs")
        os.makedirs(self.log_dir, exist_ok=True)

        tcfg = config.training
        self.precision = precision_from_amp(tcfg.use_amp, tcfg.amp_dtype)
        self.module = TFLocoformerSeparator(
            precision=self.precision, **config.separator.module_kwargs())
        self.tx = make_optimizer(tcfg)
        self.lr_ctl = LRController(tcfg)
        self.early_stop = EarlyStopping(tcfg.early_stopping)
        self.step_fn, self.eval_fn = make_speech_step(self.module, config, self.tx)

        dp, mp = config.mesh.axis_sizes(len(jax.devices()))
        if self.n_proc > 1:
            if dp * mp != len(jax.devices()) or dp % self.n_proc \
                    or tcfg.batch_size % dp:
                raise ValueError(
                    f"multihost: mesh {dp}x{mp} must cover all "
                    f"{len(jax.devices())} devices, dp divisible by "
                    f"{self.n_proc} processes, batch {tcfg.batch_size} by dp")
        else:
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
        self.best_val = float("inf")
        self.start_epoch = 0
        self._resume_from = resume
        self._log(f"Speech trainer: devices={len(jax.devices())} dp={dp} "
                  f"criterion={config.loss.wrapper}/{config.loss.criterion}")

    def _log(self, msg):
        if self.verbose:
            print(msg, flush=True)

    def _datasets(self):
        d = self.config.dataset
        train = SpeechMixtureDataset(
            d.root_dir, num_spk=d.num_spk, mix_dir=d.mix_dir,
            spk_dirs=d.spk_dirs, segment_length=d.segment_length,
            sample_rate=d.sample_rate, random_crop=True, seed=self.config.seed)
        val = None
        if d.valid_dir:
            val = SpeechMixtureDataset(
                d.valid_dir, num_spk=d.num_spk, mix_dir=d.mix_dir,
                spk_dirs=d.spk_dirs, segment_length=d.segment_length,
                sample_rate=d.sample_rate, random_crop=False)
        return train, val

    @staticmethod
    def _mono(batch):
        """[B, C, T] -> [B, T]; [B, S, C, T] -> [B, S, T] (channel mean)."""
        mix = np.asarray(batch["mixture"]).mean(axis=1)
        src = np.asarray(batch["sources"]).mean(axis=2)
        return mix.astype(np.float32), src.astype(np.float32)

    def _host_batches(self, loader):
        """Host-side prep feeding the shared prefetch pipeline (one async
        device_put per batch — same plumbing as the MSS trainer)."""
        for batch in iter(loader):
            mix, src = self._mono(batch)
            yield {"mixture": mix, "sources": src}

    def fit(self, train_loader=None, val_loader=None) -> TrainState:
        # re-assert THIS trainer's mesh for every trace in the fit scope
        # (parallel/mesh.py:activate_mesh)
        with M.activate_mesh(self.mesh):
            return self._fit(train_loader, val_loader)

    def _fit(self, train_loader=None, val_loader=None) -> TrainState:
        tcfg = self.config.training
        if train_loader is None:
            train_ds, val_ds = self._datasets()
            # multihost: per-process share of the global batch from a
            # round-robin shard of the utterance list; validation replicated
            # (see Trainer.fit)
            train_loader = DataLoader(
                train_ds, batch_size=MH.local_batch_size(tcfg.batch_size),
                shuffle=True, num_workers=tcfg.num_workers,
                seed=self.config.seed, drop_last=self.n_proc > 1,
                shard=((MH.process_index(), self.n_proc)
                       if self.n_proc > 1 else None))
            if val_ds is not None:
                val_loader = DataLoader(val_ds, batch_size=1, shuffle=False)

        first = next(iter(train_loader))
        mix0, _ = self._mono(first)
        spec0 = jnp.swapaxes(
            stft(jnp.asarray(mix0[:1]), self.config.stft.n_fft,
                 self.config.stft.hop_length), -1, -2)
        params = self.module.init(jax.random.PRNGKey(self.config.seed), spec0)
        self._log(f"Separator parameters: {count_parameters(params)/1e6:.2f} M")
        state = MH.replicate(self.mesh, init_state(params, self.tx))

        if self._resume_from:
            state, meta, epoch = self.ckpt.restore(state)
            self.start_epoch = epoch + 1
            self.best_val = meta.get("best_val_loss", float("inf"))
            self.lr_ctl.load_state_dict(meta["lr_controller"])
            self._log(f"Resumed from epoch {epoch}")

        def step(st, batch, lr, sub):
            return self.step_fn(st, batch["mixture"], batch["sources"], lr, sub)

        rng = jax.random.PRNGKey(self.config.seed + 1)
        for epoch in range(self.start_epoch, tcfg.num_epochs):
            t0 = time.time()
            state, train_loss, rng = run_train_epoch(
                step, state, self._host_batches(train_loader),
                sharding=self.batch_sharding, prefetch=tcfg.prefetch_factor,
                lr_ctl=self.lr_ctl, rng=rng, profiler=self.profiler,
                epoch=epoch, log_interval=tcfg.log_interval, log=self._log,
                scalars=self._scalars)
            self._scalars("train/loss_epoch", train_loss, epoch)
            msg = f"epoch {epoch}: train {train_loss:.4f} ({format_time(time.time()-t0)})"

            val_loss = None
            if val_loader is not None and (epoch + 1) % tcfg.val_interval == 0:
                vm = AverageMeter()
                for batch in iter(val_loader):
                    mix, src = self._mono(batch)
                    vm.update(float(self.eval_fn(state.params, mix, src)),
                              mix.shape[0])
                val_loss = vm.avg
                self.lr_ctl.on_validation(val_loss)
                self._scalars("val/loss", val_loss, epoch)
                msg += f" val {val_loss:.4f}"
            self._log(msg)

            is_best = val_loss is not None and val_loss < self.best_val
            if is_best:
                self.best_val = val_loss
            if (epoch + 1) % tcfg.save_interval == 0 or is_best:
                self.ckpt.save(epoch, state, {
                    "epoch": epoch, "val_loss": val_loss,
                    "best_val_loss": self.best_val,
                    "lr_controller": self.lr_ctl.state_dict(),
                }, is_best=is_best)
            if val_loss is not None and self.early_stop.step(val_loss):
                self._log(f"Early stopping at epoch {epoch}")
                break
        self.profiler.close()
        self._scalars.close()
        return state
