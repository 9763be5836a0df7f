"""The fused kernels' weight-cotangent contract (VERDICT round 3, weak #6).

Every custom-VJP kernel in the Pallas tier differentiates w.r.t. the
INPUT only — VGG weights are frozen in image optimization, and the
backward kernels are built for exactly that dataflow. The VJPs return
structural ZEROS for the weight/bias cotangents (never silently-wrong
values), and every public entry point documents the contract. A future
caller who trains through these kernels gets mathematically-zero weight
gradients — visible immediately in any optimizer step — rather than
plausible garbage; this suite pins both halves of that contract so a
refactor cannot silently change it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.ops.pallas import block1_packed as B1P
from style_transfer_tpu.ops.pallas import conv_gram as CG
from style_transfer_tpu.ops.pallas import conv_pair as CP
from style_transfer_tpu.ops.pallas import conv_single as CS


def _w(r, cin, cout):
    return (
        jnp.asarray(r.randn(3, 3, cin, cout).astype(np.float32) * 0.05),
        jnp.asarray(r.randn(cout).astype(np.float32) * 0.1),
    )


def _loss(out):
    if isinstance(out, tuple):
        y, g = out
        return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(g**2)
    return jnp.sum(out.astype(jnp.float32) ** 2)


def test_weight_cotangents_are_structural_zeros():
    r = np.random.RandomState(3)
    k1, b1 = _w(r, 64, 64)
    x1 = jnp.asarray(r.rand(1, 8, 8, 3).astype(np.float32))
    kb1, bb1 = _w(r, 3, 64)
    cases = [
        ("block1_packed",
         lambda k, b: _loss(B1P.block1_packed(x1, k, b, k1, b1)), kb1, bb1),
        ("pair_gram",
         lambda k, b: _loss(CP.pair_gram(
             jnp.asarray(r.rand(1, 8, 8, 64).astype(np.float32)), k, b, k1, b1
         )), k1, b1),
        ("conv_gram",
         lambda k, b: _loss((jnp.zeros(()), CG.conv_gram(
             jnp.asarray(r.rand(1, 8, 8, 64).astype(np.float32)), k, b
         ))), k1, b1),
        ("single_gram",
         lambda k, b: _loss(CS.single_gram(
             jnp.asarray(r.rand(1, 8, 8, 64).astype(np.float32)), k, b
         )), k1, b1),
    ]
    for name, loss, k, b in cases:
        dk, db = jax.grad(loss, argnums=(0, 1))(k, b)
        assert float(jnp.abs(dk).max()) == 0.0, f"{name}: dk nonzero"
        assert float(jnp.abs(db).max()) == 0.0, f"{name}: db nonzero"
        # the INPUT gradient through the same loss is NOT zero — the zeros
        # above are the contract, not a dead graph
    gx = jax.grad(lambda x: _loss(CS.single_gram(x, k1, b1)))(
        jnp.asarray(r.rand(1, 8, 8, 64).astype(np.float32))
    )
    assert float(jnp.abs(gx).max()) > 0.0


@pytest.mark.parametrize(
    "obj,needle",
    [
        (CP.make_conv_pair, "w.r.t."),
        (CS.make_conv_single, "w.r.t."),
        (CG.conv_gram, "w.r.t."),
        (B1P.block1_packed, "Gram"),
    ],
)
def test_contract_documented(obj, needle):
    doc = obj.__doc__ or ""
    assert needle in doc
    # the frozen-weight contract is stated at the entry point (or, for
    # block1_packed, in the VJP it installs)
    if "frozen" not in doc:
        from style_transfer_tpu.ops.pallas import block1_packed

        import inspect

        src = inspect.getsource(block1_packed)
        assert "never differentiates w.r.t. the VGG weights" in src or \
            "frozen" in src
