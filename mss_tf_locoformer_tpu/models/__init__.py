"""Model families + the config->module factory.

``build_model`` is the single dispatch point the Trainer, ``load_model``,
and the CLIs share: ``model.name: tflocoformer_mss`` (default) builds the
TF-Locoformer MSS model, ``model.name: bslocoformer`` the band-split
BS-Locoformer audio->stems wrapper (the reference treats BS-Locoformer as a
standalone spec->spec module with no driver,
``standalone/bslocoformer_separator.py:23-270``; here it is a first-class
lane).
"""

from __future__ import annotations

from ..core.config import BSModelConfig, ModelConfig
from ..core.precision import FP32, Precision

__all__ = ["build_model"]


def build_model(model_cfg: ModelConfig, precision: Precision = FP32):
    """Instantiate the audio->stems model for a ``ModelConfig``."""
    if isinstance(model_cfg, BSModelConfig) or model_cfg.name.startswith("bs"):
        from .bslocoformer_mss import BSLocoformerMSS
        if not isinstance(model_cfg, BSModelConfig):
            raise ValueError(
                f"model.name {model_cfg.name!r} needs a BSModelConfig "
                f"(got {type(model_cfg).__name__}); load it through "
                f"config_from_dict or construct BSModelConfig directly")
        return BSLocoformerMSS(model_cfg, precision=precision)
    if model_cfg.name != "tflocoformer_mss":
        raise ValueError(f"Unknown model.name {model_cfg.name!r} "
                         f"(expected tflocoformer_mss|bslocoformer)")
    from .mss_tflocoformer import TFLocoformerMSS
    return TFLocoformerMSS(model_cfg, precision=precision)
