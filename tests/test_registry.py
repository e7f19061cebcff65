"""Registry smoke: every public model name constructs and traces.

The reference exposes its zoo through timm's registry (train.py:502-508);
ours through ofq_tpu.models.create_model.  This abstract-trace test keeps
`list_models()` honest — a name that fails to build or whose forward
doesn't type-check at the published geometry breaks here without paying
for real-weight initialization of DeiT-B-sized models.
"""

import jax
import jax.numpy as jnp
import pytest

from ofq_tpu.models import create_model, list_models


@pytest.mark.parametrize("name", list_models())
def test_registered_name_builds_and_traces(name):
    m = create_model(name)
    s = m.cfg.img_size
    x = jax.ShapeDtypeStruct((1, s, s, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda xx: m.init({"params": jax.random.key(0)}, xx, train=False), x)
    out = jax.eval_shape(
        lambda v, xx: m.apply(v, xx, train=False), variables, x)
    logits = out[0] if isinstance(out, tuple) else out
    assert logits.shape == (1, m.cfg.num_classes)
