"""Attention U-Net: shapes, parameter count, residual path, torch cross-validation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from superresolution_for_pdes_tpu.models import AttentionUNet, count_parameters, init_unet
from superresolution_for_pdes_tpu.models.torch_import import torch_state_dict_to_variables

from torch_oracle import OracleUNet


@pytest.fixture(scope="module")
def unet():
    model, variables = init_unet(jax.random.key(0))
    return model, variables


def test_output_shape_and_dtype(unet, rng):
    model, variables = unet
    x = jnp.asarray(rng.standard_normal((2, 40, 40, 3)), jnp.float32)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 40, 40, 1)
    assert y.dtype == jnp.float32


def test_parameter_count_matches_reference(unet):
    """SURVEY.md C5: 7,834,588 parameters computed analytically from
    reference models.py:26-130."""
    _, variables = unet
    assert count_parameters(variables["params"]) == 7_834_588


def test_residual_path(unet, rng):
    """Output = head(x) + channel 0 (reference models.py:101): shifting
    channel 0 by a constant shifts the output by ~that constant when the
    network weights are zeroed except the residual."""
    model, variables = unet
    x = jnp.asarray(rng.standard_normal((1, 40, 40, 3)), jnp.float32)
    y1 = model.apply(variables, x, train=False)
    y2 = model.apply(variables, x.at[..., 0].add(5.0), train=False)
    # BatchNorm in eval mode is affine, convs are linear, but ReLUs are not —
    # still, the residual guarantees the bulk of the +5 shift passes through.
    shift = np.mean(np.asarray(y2 - y1))
    assert shift == pytest.approx(5.0, abs=1.5)


def test_train_mode_updates_batch_stats(unet, rng):
    model, variables = unet
    x = jnp.asarray(rng.standard_normal((4, 40, 40, 3)), jnp.float32)
    y, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == (4, 40, 40, 1)
    old = variables["batch_stats"]["enc1"]["bn1"]["mean"]
    new = mutated["batch_stats"]["enc1"]["bn1"]["mean"]
    assert np.any(np.asarray(old) != np.asarray(new))


def test_forward_matches_torch_oracle(rng):
    """Elementwise forward parity: random torch init -> import -> same output.

    This cross-validates conv padding, BatchNorm eval semantics, max-pooling,
    dilation, attention gates, align-corners upsampling, concat order and the
    residual in one shot.
    """
    torch.manual_seed(0)
    oracle = OracleUNet().eval()
    variables = torch_state_dict_to_variables(
        {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    )
    variables = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), variables)

    x = rng.standard_normal((2, 3, 40, 40)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()

    model = AttentionUNet()
    ours = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_kaiming_init_statistics():
    """Conv kernels ~ N(0, 2/fan_out); BN scale 1 bias 0 (models.py:209-222)."""
    _, variables = init_unet(jax.random.key(1))
    k = variables["params"]["enc2"]["conv1"]["kernel"]  # (3,3,64,128)
    fan_out = 3 * 3 * 128
    std = float(jnp.std(k))
    assert std == pytest.approx(np.sqrt(2.0 / fan_out), rel=0.1)
    bn = variables["params"]["enc2"]["bn1"]
    assert np.all(np.asarray(bn["scale"]) == 1.0)
    assert np.all(np.asarray(bn["bias"]) == 0.0)
    assert np.all(np.asarray(variables["params"]["enc2"]["conv1"]["bias"]) == 0.0)
