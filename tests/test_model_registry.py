"""Model registry and the residual-CNN baseline family."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superresolution_for_pdes_tpu.data import generate_standard_dataset
from superresolution_for_pdes_tpu.models import available_models, build_model, init_unet
from superresolution_for_pdes_tpu.train import TrainConfig, train_model


def test_registry():
    assert set(available_models()) >= {"attention_unet", "resnet"}
    m = build_model("resnet", features=16, num_blocks=2)
    assert m.features == 16
    with pytest.raises(ValueError, match="unknown model"):
        build_model("transformer")


def test_resnet_forward_and_residual(rng):
    model, variables = init_unet(
        jax.random.key(0), build_model("resnet", features=16, num_blocks=2)
    )
    x = jnp.asarray(rng.standard_normal((2, 40, 40, 3)), jnp.float32)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 40, 40, 1)
    y2 = model.apply(variables, x.at[..., 0].add(3.0), train=False)
    assert float(np.mean(np.asarray(y2 - y))) == pytest.approx(3.0, abs=1.0)


@pytest.mark.slow
def test_train_with_registry_model(tmp_path):
    ds = generate_standard_dataset(jax.random.key(0), 32)
    cfg = TrainConfig(batch_size=16, num_epochs=2, stratify_by_subdomain=False,
                      model="resnet", checkpoint_every_best=False)
    h = train_model(ds, cfg, tmp_path / "r", verbose=False)
    assert np.isfinite(h["train_loss"]).all()
    assert h["model"].__class__.__name__ == "PDEResNet"


def test_regime_router_dispatches_by_theta():
    """RegimeRouter: constant-theta samples go to the const expert, varying
    samples to the varying expert (verified against direct expert calls)."""
    import jax
    import jax.numpy as jnp

    from superresolution_for_pdes_tpu.data.generate import generate_test_dataset
    from superresolution_for_pdes_tpu.eval.single_level import predict_dataset
    from superresolution_for_pdes_tpu.models import AttentionUNet, init_unet
    from superresolution_for_pdes_tpu.models.router import RegimeRouter

    tiny = dict(enc_features=(8, 16, 32), bridge_features=32, head_features=(4, 4))
    m_const, v_const = init_unet(jax.random.key(0), AttentionUNet(**tiny))
    m_var, v_var = init_unet(jax.random.key(1), AttentionUNet(**tiny))
    router = RegimeRouter(m_const, v_const, m_var, v_var)

    d_const = generate_test_dataset(jax.random.key(2), 3, (1.0, 6.0), constant_theta=True)
    d_var = generate_test_dataset(jax.random.key(3), 3, (1.0, 6.0), constant_theta=False)

    from superresolution_for_pdes_tpu.data.generate import combine_datasets

    data = combine_datasets(d_const, d_var)
    routed = router.predict(data)
    direct_const = predict_dataset(m_const, v_const, data)
    direct_var = predict_dataset(m_var, v_var, data)
    np.testing.assert_allclose(np.asarray(routed[:3]), np.asarray(direct_const[:3]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(routed[3:]), np.asarray(direct_var[3:]),
                               rtol=1e-6)
    mask = np.asarray(router.regime_mask(data["theta_fine"]))
    assert mask.tolist() == [True] * 3 + [False] * 3


def test_wavenumber_estimation_and_highk_routing():
    """estimate_wavenumbers recovers (k1, k2) within +-1 bin from the forcing
    field; the 3-expert router sends constant-theta high-k samples to the
    high-k expert only."""
    import jax
    import jax.numpy as jnp

    from superresolution_for_pdes_tpu.data.generate import (
        combine_datasets,
        generate_test_dataset,
    )
    from superresolution_for_pdes_tpu.eval.single_level import predict_dataset
    from superresolution_for_pdes_tpu.models import AttentionUNet, init_unet
    from superresolution_for_pdes_tpu.models.router import (
        RegimeRouter,
        estimate_wavenumbers,
    )
    from superresolution_for_pdes_tpu.ops.grid import forcing_term

    for k1_true, k2_true in ((3.0, 7.0), (6.5, 2.2), (10.4, 10.9)):
        f = forcing_term(k1_true, k2_true, 40)[None]
        k1, k2 = estimate_wavenumbers(f)
        assert abs(float(k1[0]) - k1_true) <= 1.0
        assert abs(float(k2[0]) - k2_true) <= 1.0

    # the sub-bin refinement must separate the in/out-of-sample boundary at
    # k = 6 (compare_test_cases.py:599): no estimate from k < 6 may cross it
    # and none from k > 6 may fall below
    for k_true in (5.55, 5.75, 5.95):
        k1, _ = estimate_wavenumbers(forcing_term(k_true, k_true, 40)[None])
        assert float(k1[0]) < 6.0, (k_true, float(k1[0]))
    for k_true in (6.05, 6.25, 6.45):
        k1, _ = estimate_wavenumbers(forcing_term(k_true, k_true, 40)[None])
        assert float(k1[0]) >= 6.0, (k_true, float(k1[0]))

    tiny = dict(enc_features=(8, 16, 32), bridge_features=32, head_features=(4, 4))
    m_lo, v_lo = init_unet(jax.random.key(0), AttentionUNet(**tiny))
    m_var, v_var = init_unet(jax.random.key(1), AttentionUNet(**tiny))
    m_hi, v_hi = init_unet(jax.random.key(2), AttentionUNet(**tiny))
    router = RegimeRouter(
        m_lo, v_lo, m_var, v_var,
        const_high_model=m_hi, const_high_variables=v_hi, k_threshold=5.5,
    )

    d_lo = generate_test_dataset(jax.random.key(3), 2, (1.0, 4.0), constant_theta=True)
    d_hi = generate_test_dataset(jax.random.key(4), 2, (6.0, 8.0), constant_theta=True)
    d_var = generate_test_dataset(jax.random.key(5), 2, (6.0, 8.0), constant_theta=False)
    data = combine_datasets(combine_datasets(d_lo, d_hi), d_var)

    routed = router.predict(data)
    np.testing.assert_allclose(
        np.asarray(routed[:2]), np.asarray(predict_dataset(m_lo, v_lo, data)[:2]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(routed[2:4]), np.asarray(predict_dataset(m_hi, v_hi, data)[2:4]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(routed[4:]), np.asarray(predict_dataset(m_var, v_var, data)[4:]), rtol=1e-6)

def test_varying_highk_routing():
    """The 4-expert router splits the varying arm at its own k threshold:
    varying low-k samples go to the base varying expert, varying high-k to the
    varying-high expert, and const samples are untouched by the varying split."""
    import jax

    from superresolution_for_pdes_tpu.data.generate import (
        combine_datasets,
        generate_test_dataset,
    )
    from superresolution_for_pdes_tpu.eval.single_level import predict_dataset
    from superresolution_for_pdes_tpu.models import AttentionUNet, init_unet
    from superresolution_for_pdes_tpu.models.router import RegimeRouter

    tiny = dict(enc_features=(8, 16, 32), bridge_features=32, head_features=(4, 4))
    m_c, v_c = init_unet(jax.random.key(0), AttentionUNet(**tiny))
    m_v, v_v = init_unet(jax.random.key(1), AttentionUNet(**tiny))
    m_vh, v_vh = init_unet(jax.random.key(2), AttentionUNet(**tiny))
    router = RegimeRouter(
        m_c, v_c, m_v, v_v,
        varying_high_model=m_vh, varying_high_variables=v_vh,
        k_threshold_varying=5.5,
    )

    d_c = generate_test_dataset(jax.random.key(3), 2, (6.0, 8.0), constant_theta=True)
    d_vlo = generate_test_dataset(jax.random.key(4), 2, (1.0, 4.0), constant_theta=False)
    d_vhi = generate_test_dataset(jax.random.key(5), 2, (6.0, 8.0), constant_theta=False)
    data = combine_datasets(combine_datasets(d_c, d_vlo), d_vhi)

    routed = router.predict(data)
    np.testing.assert_allclose(
        np.asarray(routed[:2]), np.asarray(predict_dataset(m_c, v_c, data)[:2]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(routed[2:4]), np.asarray(predict_dataset(m_v, v_v, data)[2:4]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(routed[4:]), np.asarray(predict_dataset(m_vh, v_vh, data)[4:]), rtol=1e-6)
