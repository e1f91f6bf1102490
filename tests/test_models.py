"""Model construction / shape / mode tests (SURVEY.md §4: golden shape tests).

Small inputs keep CPU compile fast; output-stride arithmetic is what's under
test, and it is resolution-independent.
"""

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

from kd_cheap_conv_tpu.models import MODEL_FACTORY, build_model
from kd_cheap_conv_tpu.models.layers import set_bn_momentum
from kd_cheap_conv_tpu.models.mobilenetv2 import mobilenet_v2
from kd_cheap_conv_tpu.models.resnet import resnet50
from kd_cheap_conv_tpu.models.xception import xception65


def _x(h=65, w=65, n=1):
    return jnp.asarray(np.random.RandomState(0).randn(n, h, w, 3), jnp.float32)


@pytest.mark.parametrize("os_,want", [(16, 5), (8, 9)])
def test_resnet_output_stride(os_, want):
    m = resnet50(output_stride=os_, rngs=nnx.Rngs(0))
    m.eval()
    f = m(_x())
    assert f["out"].shape == (1, want, want, 2048)
    assert f["low_level"].shape == (1, 17, 17, 256)  # stride 4


@pytest.mark.parametrize("os_,want", [(16, 5), (8, 9)])
def test_mobilenet_output_stride(os_, want):
    m = mobilenet_v2(output_stride=os_, rngs=nnx.Rngs(0))
    m.eval()
    f = m(_x())
    assert f["out"].shape == (1, want, want, 320)
    assert f["low_level"].shape == (1, 17, 17, 24)


@pytest.mark.parametrize("os_,want", [(16, 5), (8, 9)])
def test_xception_output_stride(os_, want):
    m = xception65(output_stride=os_, rngs=nnx.Rngs(0))
    m.eval()
    f = m(_x())
    assert f["out"].shape == (1, want, want, 2048)
    assert f["low_level"].shape == (1, 17, 17, 128)


@pytest.mark.parametrize("name", sorted(MODEL_FACTORY))
def test_factory_end_to_end_logits(name):
    m = build_model(name, num_classes=21, output_stride=16)
    m.eval()
    x = _x(33, 33)
    y = m(x)
    assert y.shape == (1, 33, 33, 21)
    assert bool(jnp.isfinite(y).all())


def test_return_features_taps():
    m = build_model("deeplabv3plus_mobilenet", num_classes=19)
    m.eval()
    logits, taps = m(_x(33, 33), return_features=True)
    assert logits.shape == (1, 33, 33, 19)
    assert set(taps) == {"low_level", "out", "head"}
    assert taps["head"].shape[-1] == 256


def test_train_eval_bn_modes():
    m = build_model("deeplabv3plus_mobilenet", num_classes=21)
    x = _x(33, 33)
    m.train()
    y1 = m(x)
    m.eval()
    y2 = m(x)
    # BN running stats moved during the train call -> eval differs from train
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_set_bn_momentum():
    m = build_model("deeplabv3plus_resnet50", num_classes=21)
    set_bn_momentum(m.backbone, 0.01)
    mom = {mm.momentum for _, mm in nnx.iter_modules(m.backbone)
           if isinstance(mm, nnx.BatchNorm)}
    assert mom == {0.99}


@pytest.mark.slow
def test_bf16_compute_dtype():
    m = build_model("deeplabv3plus_mobilenet", num_classes=21, dtype=jnp.bfloat16)
    m.eval()
    y = m(_x(33, 33).astype(jnp.bfloat16))
    assert y.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(y.astype(jnp.float32)).all())


def test_class_major_logits_match_nhwc():
    m = build_model("deeplabv3plus_mobilenet", num_classes=7)
    m.eval()
    x = _x(33, 33)
    nhwc = m(x)
    nchw = m(x, class_major=True)
    np.testing.assert_allclose(np.asarray(nchw),
                               np.asarray(nhwc).transpose(0, 3, 1, 2),
                               rtol=1e-5, atol=1e-5)
