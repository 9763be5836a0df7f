"""Golden end-to-end regression (SURVEY.md section 4): fixed fixture weights,
fixed seed, pinned loss curve. Any numerical drift in preprocessing, VGG,
losses, or the optimizer shows up here first.

Pinned on the CPU backend (tests force it); tolerances absorb BLAS
reduction-order noise across machines, not algorithm changes.
"""

import numpy as np

from style_transfer_tpu.api import StyleTransfer, StylizeConfig
from style_transfer_tpu.optim import OptimizerSpec

GOLDEN_LOSSES = [
    8.829572, 4.826355, 5.094016, 3.476011,
    3.778829, 3.317437, 2.328271, 2.134655,
]
GOLDEN_OUT_MEAN = 0.505047
GOLDEN_OUT_STD = 0.254036


def test_golden_loss_curve():
    r = np.random.RandomState(123)
    content = r.rand(24, 24, 3).astype(np.float32)
    style = r.rand(24, 24, 3).astype(np.float32)
    cfg = StylizeConfig(
        size=24, min_scale=24, iterations=(8,), chunk_size=8,
        content_layers=("conv2_2",), style_layers=("conv1_1", "conv2_1"),
        use_fused=False, init="random", seed=11,
        optimizer=OptimizerSpec("adam", learning_rate=0.05),
    )
    events = []
    out = StyleTransfer().stylize(content, style, cfg, callback=events.append)
    losses = np.concatenate([e.losses["loss"] for e in events])
    np.testing.assert_allclose(losses, GOLDEN_LOSSES, rtol=1e-4)
    np.testing.assert_allclose(float(out.mean()), GOLDEN_OUT_MEAN, atol=1e-4)
    np.testing.assert_allclose(float(out.std()), GOLDEN_OUT_STD, atol=1e-4)


GOLDEN16_LOSSES = [
    4.518771, 3.890597, 2.747350, 2.320043,
    2.278023, 1.599841, 1.430745, 1.528424,
]
GOLDEN16_OUT_MEAN = 0.499656
GOLDEN16_OUT_STD = 0.252605


def test_golden_loss_curve_vgg16():
    """Same pinned-curve regression for the VGG-16 family, with layers deep
    enough (conv4_2/conv5_1) that the architectures genuinely diverge."""
    from style_transfer_tpu.models.weights import random_fixture

    r = np.random.RandomState(123)
    content = r.rand(24, 24, 3).astype(np.float32)
    style = r.rand(24, 24, 3).astype(np.float32)
    params, mean, std = random_fixture(0, arch="vgg16")
    cfg = StylizeConfig(
        size=24, min_scale=24, iterations=(8,), chunk_size=8,
        content_layers=("conv4_2",), style_layers=("conv1_1", "conv3_1", "conv5_1"),
        use_fused=False, init="random", seed=11,
        optimizer=OptimizerSpec("adam", learning_rate=0.05),
    )
    events = []
    out = StyleTransfer(params, mean=mean, std=std).stylize(
        content, style, cfg, callback=events.append
    )
    losses = np.concatenate([e.losses["loss"] for e in events])
    np.testing.assert_allclose(losses, GOLDEN16_LOSSES, rtol=1e-4)
    np.testing.assert_allclose(float(out.mean()), GOLDEN16_OUT_MEAN, atol=1e-4)
    np.testing.assert_allclose(float(out.std()), GOLDEN16_OUT_STD, atol=1e-4)
