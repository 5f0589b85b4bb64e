"""Typed configuration system.

The reference consumes plain YAML dicts unpacked directly into constructors
(``training/train.py:247-248,332`` in the reference), silently ignoring unknown
training keys.  Here every config is a frozen dataclass with strict validation:
unknown keys raise, and keys the reference silently ignored (``betas``,
``gradient_clip``, ``warmup_steps``, ...) are actually implemented.

YAML surface stays compatible with the reference's ``configs/*.yaml`` layout
(sections: dataset / model / loss / training / evaluation / paths / seed).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional, Sequence, Tuple, Union

import yaml

__all__ = [
    "ModelConfig",
    "BSModelConfig",
    "LossConfig",
    "DatasetConfig",
    "OptimizerConfig",
    "SchedulerConfig",
    "TrainingConfig",
    "EvaluationConfig",
    "PathsConfig",
    "MeshConfig",
    "Config",
    "SpeechDatasetConfig",
    "SeparatorConfig",
    "STFTConfig",
    "SpeechLossConfig",
    "SpeechConfig",
    "load_config",
    "load_speech_config",
    "config_from_dict",
    "speech_config_from_dict",
]

SOURCE_NAMES = ("vocals", "drums", "bass", "other")


def _as_tuple(x):
    if isinstance(x, (list, tuple)):
        return tuple(x)
    return x


def _build(cls, data: Mapping[str, Any], ctx: str):
    """Instantiate a dataclass from a mapping, rejecting unknown keys."""
    if data is None:
        data = {}
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(data) - names
    if unknown:
        raise ValueError(f"Unknown key(s) {sorted(unknown)} in config section '{ctx}'. "
                         f"Valid keys: {sorted(names)}")
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
            v = _build(f.type, v, f"{ctx}.{f.name}")
        kwargs[f.name] = _as_tuple(v) if isinstance(v, list) else v
    return cls(**kwargs)


@dataclass(frozen=True)
class ModelConfig:
    """TF-Locoformer MSS model hyper-parameters.

    Mirrors the constructor surface of the reference model
    (``models/mss_tflocoformer.py:104-128``).
    """

    name: str = "tflocoformer_mss"
    # Audio / transform
    n_fft: int = 2048
    hop_length: int = 1024
    # Architecture
    n_sources: int = 4
    n_layers: int = 6
    emb_dim: int = 128
    norm_type: str = "rmsgroupnorm"  # {"layernorm", "rmsgroupnorm"}
    num_groups: int = 4
    tf_order: str = "ft"  # {"ft", "tf"}
    # Attention
    n_heads: int = 4
    flash_attention: bool = False  # on TPU: selects the Pallas flash kernel
    fused_stft: bool = False  # Pallas fused framing+window+rDFT STFT/iSTFT
    fused_ffn: bool = False   # Pallas fused conv-SwiGLU-deconv FFN kernel
    remat_blocks: bool = False  # rematerialize each TF block in backward
    # (set by the trainer from training.gradient_checkpointing)
    remat_ffn: Optional[bool] = None  # per-FFN remat; None = follow remat_blocks
    attention_dim: int = 128
    pos_enc: str = "rope"  # {"rope", "nope"}
    # FFN
    ffn_type: Union[str, Tuple[str, ...]] = "swiglu_conv1d"
    ffn_hidden_dim: Union[int, Tuple[int, ...]] = 384
    conv1d_kernel: int = 4
    conv1d_shift: int = 1
    dropout: float = 0.0
    # Misc
    eps: float = 1.0e-5

    def __post_init__(self):
        object.__setattr__(self, "ffn_type", _as_tuple(self.ffn_type))
        object.__setattr__(self, "ffn_hidden_dim", _as_tuple(self.ffn_hidden_dim))
        if self.norm_type not in ("layernorm", "rmsgroupnorm"):
            raise ValueError(f"norm_type must be layernorm|rmsgroupnorm, got {self.norm_type}")
        if self.tf_order not in ("ft", "tf"):
            raise ValueError(f"tf_order must be ft|tf, got {self.tf_order}")
        if self.pos_enc not in ("rope", "nope"):
            raise ValueError(f"pos_enc must be rope|nope, got {self.pos_enc}")
        if self.attention_dim % self.n_heads != 0:
            raise ValueError(f"attention_dim {self.attention_dim} not divisible by n_heads {self.n_heads}")
        if self.emb_dim % self.num_groups != 0 and self.norm_type == "rmsgroupnorm":
            raise ValueError(f"emb_dim {self.emb_dim} not divisible by num_groups {self.num_groups}")
        macaron = isinstance(self.ffn_type, tuple)
        if macaron:
            if len(self.ffn_type) != 2 or not isinstance(self.ffn_hidden_dim, tuple) \
                    or len(self.ffn_hidden_dim) != 2:
                raise ValueError("Macaron style needs 2-element ffn_type and ffn_hidden_dim lists")
        types = self.ffn_type if macaron else (self.ffn_type,)
        for t in types:
            if t not in ("conv1d", "swiglu_conv1d"):
                raise ValueError(f"ffn_type entries must be conv1d|swiglu_conv1d, got {t}")

    @property
    def macaron(self) -> bool:
        return isinstance(self.ffn_type, tuple)

    @property
    def head_dim(self) -> int:
        return self.attention_dim // self.n_heads

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1


@dataclass(frozen=True)
class BSModelConfig(ModelConfig):
    """BS-Locoformer extras (band-split variant).

    Mirrors ``standalone/bslocoformer_separator.py:69-96`` of the reference.
    """

    name: str = "bslocoformer"
    sample_rate: int = 44100
    stft_size: int = 2048
    masking: bool = True
    stereo: bool = False


@dataclass(frozen=True)
class LossConfig:
    """Mirrors the reference ``MSSLoss`` constructor (``models/mss_loss.py:34-48``)."""

    loss_type: str = "combined"  # {"si_sdr", "l1", "l2", "combined"}
    si_sdr_weight: float = 1.0
    l1_weight: float = 0.1
    spectral_weight: float = 0.1
    eps: float = 1.0e-8
    # The reference SpectralLoss always uses its own defaults (n_fft=2048, hop=1024)
    # regardless of model config (``models/mss_loss.py:184-193``); these knobs default
    # to that behavior but are configurable here.
    spectral_n_fft: int = 2048
    spectral_hop_length: int = 1024

    def __post_init__(self):
        if self.loss_type not in ("si_sdr", "l1", "l2", "combined"):
            raise ValueError(f"invalid loss_type {self.loss_type}")


@dataclass(frozen=True)
class DatasetConfig:
    name: str = "musdb18hq"
    root_dir: str = ""
    sample_rate: int = 44100
    segment_length: Optional[int] = 132300
    sources: Tuple[str, ...] = SOURCE_NAMES
    augmentation: bool = False
    random_chunks: bool = True
    # extensions over the reference surface (cache + sampling knobs that the
    # reference hardcodes in ``data/mss_dataset.py``)
    min_loudness: float = 1.0e-4
    max_chunk_attempts: int = 8
    rebuild_mixture: bool = True
    cache_dir: Optional[str] = None
    # precomputed loudness-filtered chunk index (reference
    # ``data/mss_dataset.py:284-346``): deterministic epoch coverage instead
    # of random chunk sampling; hop defaults to segment_length in the dataset.
    precompute_chunks: bool = False
    chunk_hop: Optional[int] = None

    def __post_init__(self):
        object.__setattr__(self, "sources", tuple(self.sources))


@dataclass(frozen=True)
class OptimizerConfig:
    type: str = "adamw"
    lr: float = 5.0e-4
    weight_decay: float = 0.01
    eps: float = 1.0e-8
    betas: Tuple[float, float] = (0.9, 0.999)
    fused: bool = True  # accepted for YAML compat; optax is always fused by XLA

    def __post_init__(self):
        object.__setattr__(self, "betas", tuple(self.betas))


@dataclass(frozen=True)
class SchedulerConfig:
    type: str = "reducelronplateau"
    mode: str = "min"
    factor: float = 0.5
    patience: int = 8
    min_lr: float = 1.0e-7
    cooldown: int = 0
    # warmup (present in reference configs but unimplemented there; implemented here)
    warmup_steps: int = 0
    warmup_start_lr: float = 0.0


@dataclass(frozen=True)
class EarlyStoppingConfig:
    enabled: bool = False
    patience: int = 20
    min_delta: float = 0.0


@dataclass(frozen=True)
class TrainingConfig:
    batch_size: int = 1
    num_epochs: int = 300
    gradient_clip: float = 5.0
    num_workers: int = 4
    pin_memory: bool = True           # YAML compat; prefetch is always async here
    prefetch_factor: int = 2
    persistent_workers: bool = True   # YAML compat
    gradient_checkpointing: bool = False
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    use_amp: bool = True
    amp_dtype: str = "bfloat16"
    gradient_accumulation_steps: int = 1
    save_interval: int = 5
    keep_last: int = 10
    save_best: bool = True
    save_optimizer: bool = True
    val_interval: int = 1
    # Validation runs on fixed-length chunks so one XLA program serves every
    # track (the reference's full-track validation is the documented OOM
    # hazard, ``training/train.py:175-239``).  None -> dataset segment_length
    # (or 10 s if that is None too).  val_batch_size chunks per eval step.
    val_segment_length: Optional[int] = None
    val_batch_size: int = 4
    early_stopping: EarlyStoppingConfig = field(default_factory=EarlyStoppingConfig)
    log_interval: int = 50
    # jax.profiler trace window: capture `profile_steps` steps starting at
    # `profile_start_step` into <log_dir>/plugins/profile (TensorBoard).
    # 0 disables (the reference has no profiler; SURVEY.md §5).
    profile_steps: int = 0
    profile_start_step: int = 5

    def __post_init__(self):
        if self.amp_dtype not in ("bfloat16", "float16", "float32"):
            raise ValueError(f"amp_dtype must be bfloat16|float16|float32, got {self.amp_dtype}")


@dataclass(frozen=True)
class EvaluationConfig:
    batch_size: int = 1
    save_outputs: bool = False
    metrics: Tuple[str, ...] = ("si_sdr", "sdr", "sar", "sir")

    def __post_init__(self):
        object.__setattr__(self, "metrics", tuple(self.metrics))


@dataclass(frozen=True)
class PathsConfig:
    output_dir: str = "./experiments"
    checkpoint_dir: str = "./experiments/checkpoints"
    log_dir: str = "./experiments/logs"


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit sharding (TPU-native; no reference analogue —
    the reference is single-GPU, with DDP only in external ESPnet recipes)."""

    dp: int = -1   # -1: all remaining devices
    mp: int = 1    # model axis (head/ffn sharding), usually 1 for these model sizes

    def axis_sizes(self, n_devices: int) -> Tuple[int, int]:
        mp = max(1, self.mp)
        dp = self.dp if self.dp > 0 else max(1, n_devices // mp)
        return dp, mp


@dataclass(frozen=True)
class Config:
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    evaluation: EvaluationConfig = field(default_factory=EvaluationConfig)
    paths: PathsConfig = field(default_factory=PathsConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    seed: int = 42


# --------------------------------------------------------------------------
# Speech-separation task (the reference trains these through external ESPnet
# recipes, ``egs2/*/enh1/conf/tuning/train_enh_tflocoformer.yaml``; here the
# same surface is first-class).

@dataclass(frozen=True)
class SpeechDatasetConfig:
    """wsj0-2mix-style parallel-directory corpus (``data/speech.py``)."""

    root_dir: str = ""
    valid_dir: Optional[str] = None   # separate dev-set root (else no val)
    num_spk: int = 2
    mix_dir: str = "mix"
    spk_dirs: Optional[Tuple[str, ...]] = None
    sample_rate: int = 8000
    segment_length: Optional[int] = 32000  # 4 s at 8 kHz (recipe default)

    def __post_init__(self):
        if self.spk_dirs is not None:
            object.__setattr__(self, "spk_dirs", tuple(self.spk_dirs))


@dataclass(frozen=True)
class SeparatorConfig:
    """``TFLocoformerSeparator`` surface (reference
    ``standalone/tflocoformer_separator.py:173-227``)."""

    num_spk: int = 2
    n_layers: int = 6
    emb_dim: int = 128
    norm_type: str = "rmsgroupnorm"
    num_groups: int = 4
    tf_order: str = "ft"
    n_heads: int = 4
    flash_attention: bool = False
    fused_ffn: bool = False
    attention_dim: int = 128
    pos_enc: str = "rope"
    ffn_type: Union[str, Tuple[str, ...]] = "swiglu_conv1d"
    ffn_hidden_dim: Union[int, Tuple[int, ...]] = 384
    conv1d_kernel: int = 4
    conv1d_shift: int = 1
    dropout: float = 0.0
    eps: float = 1.0e-5

    def __post_init__(self):
        object.__setattr__(self, "ffn_type", _as_tuple(self.ffn_type))
        object.__setattr__(self, "ffn_hidden_dim", _as_tuple(self.ffn_hidden_dim))

    def module_kwargs(self) -> dict:
        d = dataclasses.asdict(self)
        d["ffn_type"] = _as_tuple(d["ffn_type"])
        d["ffn_hidden_dim"] = _as_tuple(d["ffn_hidden_dim"])
        return d


@dataclass(frozen=True)
class STFTConfig:
    """Recipe transform (``egs2/wsj0_2mix/.../train_enh_tflocoformer.yaml:
    50-57``: n_fft 128, hop 64 at 8 kHz)."""

    n_fft: int = 128
    hop_length: int = 64


@dataclass(frozen=True)
class SpeechLossConfig:
    """PIT criteria (recipes: ``wrapper: pit``+``criterion: si_snr``;
    DNS: ``wrapper: fixed_order``+``criterion: mr_l1_tfd``)."""

    criterion: str = "si_snr"     # {"si_snr", "mr_l1_tfd"}
    wrapper: str = "pit"          # {"pit", "fixed_order"}

    def __post_init__(self):
        if self.criterion not in ("si_snr", "mr_l1_tfd"):
            raise ValueError(f"criterion must be si_snr|mr_l1_tfd, got {self.criterion}")
        if self.wrapper not in ("pit", "fixed_order"):
            raise ValueError(f"wrapper must be pit|fixed_order, got {self.wrapper}")


@dataclass(frozen=True)
class SpeechConfig:
    task: str = "speech_separation"
    dataset: SpeechDatasetConfig = field(default_factory=SpeechDatasetConfig)
    separator: SeparatorConfig = field(default_factory=SeparatorConfig)
    stft: STFTConfig = field(default_factory=STFTConfig)
    loss: SpeechLossConfig = field(default_factory=SpeechLossConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    paths: PathsConfig = field(default_factory=PathsConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    seed: int = 42


_SECTIONS = {
    "dataset": DatasetConfig,
    "model": ModelConfig,
    "loss": LossConfig,
    "training": TrainingConfig,
    "evaluation": EvaluationConfig,
    "paths": PathsConfig,
    "mesh": MeshConfig,
}

# Top-level keys present in reference YAMLs that map to nothing here (hardware
# selection is implicit on TPU).  Accepted and ignored, with a warning.
_IGNORED_TOP_LEVEL = {"device", "num_gpu", "gpu_id", "performance", "memory"}


def config_from_dict(raw: Mapping[str, Any]) -> Config:
    kwargs: dict = {}
    ignored = []
    for key, val in raw.items():
        if key == "seed":
            kwargs["seed"] = int(val)
        elif key in _SECTIONS:
            cls = _SECTIONS[key]
            if key == "model" and isinstance(val, Mapping) and val.get("name", "").startswith("bs"):
                cls = BSModelConfig
            if key == "training" and isinstance(val, Mapping):
                val = dict(val)
                # reference xlarge config puts warmup at the training level
                # (``configs/musdb18_rtx5090_xlarge.yaml``); fold into scheduler
                sched = dict(val.get("scheduler") or {})
                for wk in ("warmup_steps", "warmup_start_lr"):
                    if wk in val:
                        sched.setdefault(wk, val.pop(wk))
                if sched:
                    val["scheduler"] = sched
                if "optimizer" in val:
                    val["optimizer"] = _build(OptimizerConfig, val["optimizer"], "training.optimizer")
                if "scheduler" in val:
                    val["scheduler"] = _build(SchedulerConfig, val["scheduler"], "training.scheduler")
                if "early_stopping" in val:
                    es = dict(val["early_stopping"])
                    es.setdefault("enabled", True)
                    val["early_stopping"] = _build(EarlyStoppingConfig, es, "training.early_stopping")
            kwargs[key] = _build(cls, val, key)
        elif key in _IGNORED_TOP_LEVEL:
            ignored.append(key)
        else:
            raise ValueError(f"Unknown top-level config key: {key!r}")
    if ignored:
        import logging
        logging.getLogger(__name__).warning(
            "Ignoring GPU-specific config sections (N/A on TPU): %s", ignored)
    return Config(**kwargs)


def load_config(path: str) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return config_from_dict(raw)


_SPEECH_SECTIONS = {
    "dataset": SpeechDatasetConfig,
    "separator": SeparatorConfig,
    "stft": STFTConfig,
    "loss": SpeechLossConfig,
    "paths": PathsConfig,
    "mesh": MeshConfig,
}


def speech_config_from_dict(raw: Mapping[str, Any]) -> SpeechConfig:
    kwargs: dict = {}
    for key, val in raw.items():
        if key == "seed":
            kwargs["seed"] = int(val)
        elif key == "task":
            kwargs["task"] = str(val)
        elif key == "training":
            val = dict(val)
            sched = dict(val.get("scheduler") or {})
            for wk in ("warmup_steps", "warmup_start_lr"):
                if wk in val:
                    sched.setdefault(wk, val.pop(wk))
            if sched:
                val["scheduler"] = sched
            if "optimizer" in val:
                val["optimizer"] = _build(OptimizerConfig, val["optimizer"],
                                          "training.optimizer")
            if "scheduler" in val:
                val["scheduler"] = _build(SchedulerConfig, val["scheduler"],
                                          "training.scheduler")
            if "early_stopping" in val:
                val["early_stopping"] = _build(EarlyStoppingConfig,
                                               val["early_stopping"],
                                               "training.early_stopping")
            kwargs["training"] = _build(TrainingConfig, val, "training")
        elif key in _SPEECH_SECTIONS:
            kwargs[key] = _build(_SPEECH_SECTIONS[key], val, key)
        else:
            raise ValueError(f"Unknown top-level key '{key}' in speech config. "
                             f"Valid: {sorted(_SPEECH_SECTIONS) + ['training', 'seed', 'task']}")
    return SpeechConfig(**kwargs)


def load_speech_config(path: str) -> SpeechConfig:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return speech_config_from_dict(raw)
