"""Driver entry points compile and run on the CPU mesh."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_jits():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 40, 40, 1)


@pytest.mark.slow
def test_dryrun_multichip_eight():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_bfloat16_model_forward():
    """The dtype knob: bf16 compute with f32 params."""
    from superresolution_for_pdes_tpu.models import AttentionUNet, init_unet

    model, variables = init_unet(
        jax.random.key(0),
        AttentionUNet(enc_features=(8, 16, 32), bridge_features=32,
                      head_features=(4, 4), dtype=jnp.bfloat16),
    )
    x = jnp.ones((2, 40, 40, 3), jnp.bfloat16)
    y = model.apply(variables, x, train=False)
    assert y.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(y.astype(jnp.float32)).all())
