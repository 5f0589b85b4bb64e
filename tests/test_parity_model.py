"""End-to-end numerical parity: JAX model vs torch oracle, weights transferred
through the checkpoint converter (tests both at once)."""

import numpy as np
import pytest
import torch

from mss_tf_locoformer_tpu.convert.torch_ckpt import convert_state_dict, params_to_state_dict
from mss_tf_locoformer_tpu.core.config import ModelConfig
from mss_tf_locoformer_tpu.models.mss_tflocoformer import TFLocoformerMSS

from torch_oracle import OracleMSS


def _numpy_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _build_pair(norm_type="rmsgroupnorm", tf_order="ft", macaron=True, use_rope=True,
                n_layers=2, conv1d_kernel=4, conv1d_shift=1):
    torch.manual_seed(0)
    ffn_types = ("swiglu_conv1d", "swiglu_conv1d") if macaron else "swiglu_conv1d"
    ffn_dims = (32, 24) if macaron else 32
    oracle = OracleMSS(n_fft=256, hop=64, n_layers=n_layers, emb=16, num_groups=4,
                       heads=2, attn_dim=16,
                       ffn_types=ffn_types if macaron else (ffn_types,),
                       ffn_dims=ffn_dims if macaron else (ffn_dims,),
                       k=conv1d_kernel, s=conv1d_shift,
                       tf_order=tf_order, norm_type=norm_type, use_rope=use_rope)
    cfg = ModelConfig(n_fft=256, hop_length=64, n_layers=n_layers, emb_dim=16,
                      num_groups=4, n_heads=2, attention_dim=16,
                      norm_type=norm_type, tf_order=tf_order,
                      pos_enc="rope" if use_rope else "nope",
                      ffn_type=ffn_types, ffn_hidden_dim=ffn_dims,
                      conv1d_kernel=conv1d_kernel, conv1d_shift=conv1d_shift)
    model = TFLocoformerMSS(cfg)
    params = convert_state_dict(_numpy_sd(oracle))
    return oracle, model, params


@pytest.mark.parametrize("norm_type", ["rmsgroupnorm", "layernorm"])
@pytest.mark.parametrize("tf_order", ["ft", "tf"])
def test_full_model_parity(rng, norm_type, tf_order):
    oracle, model, params = _build_pair(norm_type=norm_type, tf_order=tf_order)
    x = rng.standard_normal((2, 4000), dtype=np.float32) * 0.5
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()  # [B, S, T]
    out = model.apply(params, x)
    got = np.stack([np.asarray(out[k]) for k in ("vocals", "drums", "bass", "other")], 1)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_parity_no_macaron_no_rope(rng):
    oracle, model, params = _build_pair(macaron=False, use_rope=False, n_layers=1)
    x = rng.standard_normal((1, 3000), dtype=np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()
    out = model.apply(params, x)
    got = np.stack([np.asarray(out[k]) for k in ("vocals", "drums", "bass", "other")], 1)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_parity_kernel8(rng):
    """whamr-style conv1d_kernel=8 (egs2/whamr conf: conv1d_kernel: 8)."""
    oracle, model, params = _build_pair(conv1d_kernel=8)
    x = rng.standard_normal((1, 3000), dtype=np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()
    out = model.apply(params, x)
    got = np.stack([np.asarray(out[k]) for k in ("vocals", "drums", "bass", "other")], 1)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_spec_output_parity(rng):
    oracle, model, params = _build_pair()
    x = rng.standard_normal((1, 3000), dtype=np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x), time_domain=False).numpy()
    out = model.apply(params, x, return_time_domain=False)
    got = np.stack([np.asarray(out[k]) for k in ("vocals", "drums", "bass", "other")], 1)
    np.testing.assert_allclose(got.real, ref.real, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(got.imag, ref.imag, atol=5e-4, rtol=1e-3)


def test_roundtrip_state_dict(rng):
    oracle, model, params = _build_pair()
    sd = _numpy_sd(oracle)
    back = params_to_state_dict(params)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])
