"""Shape/grad grids for the speech separators (ports the reference's
``tests/test_tflocoformer.py`` and ``tests/test_bslocoformer.py`` pytest
strategy to JAX)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mss_tf_locoformer_tpu.models.bslocoformer import (BSLocoformerSeparator,
                                                       compute_bands)
from mss_tf_locoformer_tpu.models.tflocoformer import TFLocoformerSeparator


def _rand_spec(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)) \
        .astype(np.complex64)


@pytest.mark.parametrize("num_spk", [1, 2])
@pytest.mark.parametrize("tf_order", ["ft", "tf"])
@pytest.mark.parametrize("norm_type", ["layernorm", "rmsgroupnorm"])
@pytest.mark.parametrize("pos_enc", ["rope", "nope"])
def test_tflocoformer_shapes(rng, num_spk, tf_order, norm_type, pos_enc):
    model = TFLocoformerSeparator(
        num_spk=num_spk, n_layers=1, emb_dim=16, norm_type=norm_type,
        num_groups=4, tf_order=tf_order, n_heads=2, attention_dim=16,
        pos_enc=pos_enc, ffn_type="swiglu_conv1d", ffn_hidden_dim=32)
    spec = _rand_spec(rng, (2, 50, 65))
    params = model.init(jax.random.PRNGKey(0), spec)
    out = model.apply(params, spec)
    assert out.shape == (2, num_spk, 50, 65)
    assert out.dtype == np.complex64


@pytest.mark.parametrize("macaron", [True, False])
@pytest.mark.parametrize("conv1d_kernel", [4, 8])
def test_tflocoformer_ffn_variants(rng, macaron, conv1d_kernel):
    ffn_type = ("swiglu_conv1d", "swiglu_conv1d") if macaron else "swiglu_conv1d"
    ffn_dim = (32, 32) if macaron else 32
    model = TFLocoformerSeparator(num_spk=2, n_layers=1, emb_dim=16,
                                  num_groups=4, n_heads=2, attention_dim=16,
                                  ffn_type=ffn_type, ffn_hidden_dim=ffn_dim,
                                  conv1d_kernel=conv1d_kernel)
    spec = _rand_spec(rng, (2, 50, 65))
    params = model.init(jax.random.PRNGKey(0), spec)
    assert model.apply(params, spec).shape == (2, 2, 50, 65)


def test_tflocoformer_backward(rng):
    model = TFLocoformerSeparator(num_spk=2, n_layers=1, emb_dim=16,
                                  num_groups=4, n_heads=2, attention_dim=16,
                                  ffn_type="swiglu_conv1d", ffn_hidden_dim=32)
    spec = _rand_spec(rng, (2, 30, 33))
    params = model.init(jax.random.PRNGKey(0), spec)

    def loss(p):
        out = model.apply(p, spec)
        return jnp.sum(jnp.abs(out) ** 2)

    grads = jax.grad(loss)(params)
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert any(n > 0 for n in norms)


def test_compute_bands_44k():
    bands = compute_bands(2048, 44100)
    assert sum(bands) == 1025
    # low bands are 2 bins wide (0-1 kHz at 2-bin resolution)
    assert bands[0] == 2


def test_compute_bands_48k():
    bands = compute_bands(2048, 48000)
    assert sum(bands) == 1025
    assert len([b for b in bands[-4:]]) == 4  # remainder split in 4 at 48 kHz


@pytest.mark.parametrize("masking", [True, False])
@pytest.mark.parametrize("stereo", [True, False])
@pytest.mark.parametrize("sample_rate", [44100, 48000])
def test_bslocoformer_shapes(rng, masking, stereo, sample_rate):
    model = BSLocoformerSeparator(
        num_spk=2, n_layers=1, emb_dim=16, num_groups=4, n_heads=2,
        attention_dim=16, ffn_type="swiglu_conv1d", ffn_hidden_dim=32,
        sample_rate=sample_rate, stft_size=512, masking=masking, stereo=stereo)
    m = 2 if stereo else 1
    spec = _rand_spec(rng, (2, m, 20, 257))
    params = model.init(jax.random.PRNGKey(0), spec)
    out = model.apply(params, spec)
    if stereo:
        assert out.shape == (2, 2, 2, 20, 257)
    else:
        assert out.shape == (2, 2, 20, 257)
    assert out.dtype == np.complex64


def test_bslocoformer_mono_3d_input(rng):
    model = BSLocoformerSeparator(num_spk=2, n_layers=1, emb_dim=16,
                                  num_groups=4, n_heads=2, attention_dim=16,
                                  ffn_type="swiglu_conv1d", ffn_hidden_dim=32,
                                  stft_size=512)
    spec = _rand_spec(rng, (1, 20, 257))
    params = model.init(jax.random.PRNGKey(0), spec)
    assert model.apply(params, spec).shape == (1, 2, 20, 257)


def test_bslocoformer_backward(rng):
    model = BSLocoformerSeparator(num_spk=2, n_layers=1, emb_dim=16,
                                  num_groups=4, n_heads=2, attention_dim=16,
                                  ffn_type="swiglu_conv1d", ffn_hidden_dim=32,
                                  stft_size=512)
    spec = _rand_spec(rng, (1, 10, 257))
    params = model.init(jax.random.PRNGKey(0), spec)

    def loss(p):
        return jnp.sum(jnp.abs(model.apply(p, spec)) ** 2)

    grads = jax.grad(loss)(params)
    assert all(np.isfinite(float(jnp.linalg.norm(g)))
               for g in jax.tree.leaves(grads))
