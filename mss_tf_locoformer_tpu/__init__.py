"""mss_tf_locoformer_tpu — TPU-native TF-Locoformer music source separation.

A from-scratch JAX/XLA/Pallas framework with the capability surface of
chynggi/mss-tf-locoformer (PyTorch): TF-Locoformer MSS (audio -> 4 stems),
the original MERL speech separators (spec -> spec and band-split
BS-Locoformer), losses, MUSDB18 data pipeline (native C++ audio engine),
pjit training, chunked-OLA inference, evaluation, and a PyTorch checkpoint
converter.
"""

__version__ = "0.1.0"

from .core.config import (BSModelConfig, Config, DatasetConfig, LossConfig,
                          ModelConfig, TrainingConfig, load_config)
from .core.precision import BF16, FP32, Precision

__all__ = [
    "BF16", "FP32", "Precision",
    "BSModelConfig", "Config", "DatasetConfig", "LossConfig", "ModelConfig",
    "TrainingConfig", "load_config",
    "TFLocoformerMSS", "TFLocoformerSeparator", "BSLocoformerSeparator",
    "MSSTransform",
]


def __getattr__(name):  # lazy heavy imports
    if name == "TFLocoformerMSS":
        from .models.mss_tflocoformer import TFLocoformerMSS
        return TFLocoformerMSS
    if name == "TFLocoformerSeparator":
        from .models.tflocoformer import TFLocoformerSeparator
        return TFLocoformerSeparator
    if name == "BSLocoformerSeparator":
        from .models.bslocoformer import BSLocoformerSeparator
        return BSLocoformerSeparator
    if name == "MSSTransform":
        from .ops.stft import MSSTransform
        return MSSTransform
    raise AttributeError(name)
