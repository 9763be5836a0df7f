"""Image-domain optimizers: Adam and L-BFGS, fully on-device.

The reference updates pixels on the host with NumPy each iteration — the
hottest host<->device boundary in its loop (SURVEY.md section 3.3). Here the
optimizer is an optax ``GradientTransformation`` and the *entire* update
(value+grad, direction, line search, pixel update) happens inside the jitted
step; chunks of steps run as one ``lax.scan`` with donated carries, so the
image and optimizer state never leave HBM between host syncs.

L-BFGS is optax's implementation: fixed-memory two-loop recursion with a
zoom line search, both expressed as bounded ``lax`` control flow — the exact
shape recommended for jit (SURVEY.md section 7, hard part 3).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

ObjectiveFn = Callable[[jnp.ndarray], Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]
# step :: (image, opt_state) -> (image, opt_state, aux-losses dict)
StepFn = Callable[[jnp.ndarray, Any], Tuple[jnp.ndarray, Any, Dict[str, jnp.ndarray]]]


@dataclasses.dataclass(frozen=True)
class OptimizerSpec:
    """CLI-level optimizer selection (SURVEY.md section 2 row 5)."""

    name: str = "adam"  # "adam" | "lbfgs"
    learning_rate: float = 0.05
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    memory_size: int = 10  # L-BFGS history window
    max_linesearch_steps: int = 16
    # Absolute epsilon on the zoom linesearch's Wolfe conditions. bfloat16
    # VGG gradients carry O(1e-4) noise in the directional derivatives at
    # megapixel sizes, below which the strong-Wolfe curvature condition can
    # never be met exactly — measured at 1024px the search then burns its
    # full step budget every iteration (591 ms/it vs 36 for Adam;
    # num_linesearch_steps pinned at 16 with curvature_error ~4e-4). The
    # classic approximate-Wolfe epsilon absorbs that noise. Note it relaxes
    # the accept conditions for every backend: an fp32/CPU run may accept a
    # step the exact condition would reject near the margin, so fp32
    # trajectories can differ slightly from tol=0 (the scipy cross-checks in
    # tests pass because their problems sit far from the margin). Set
    # linesearch_tol=0.0 for strict Wolfe conditions.
    linesearch_tol: float = 1e-3

    def build(self) -> optax.GradientTransformation:
        if self.name == "adam":
            return optax.adam(self.learning_rate, b1=self.beta1, b2=self.beta2, eps=self.eps)
        if self.name == "lbfgs":
            return optax.lbfgs(
                memory_size=self.memory_size,
                linesearch=optax.scale_by_zoom_linesearch(
                    max_linesearch_steps=self.max_linesearch_steps,
                    tol=self.linesearch_tol,
                ),
            )
        raise ValueError(f"unknown optimizer {self.name!r} (expected 'adam' or 'lbfgs')")

    @property
    def needs_value_fn(self) -> bool:
        """L-BFGS's line search re-evaluates the objective inside the step."""
        return self.name == "lbfgs"


def make_step_fn(objective: ObjectiveFn, spec: OptimizerSpec) -> Tuple[StepFn, optax.GradientTransformation]:
    """Build a single-update step function around ``objective``.

    ``objective(image) -> (loss, aux_terms)`` must be pure; the returned step
    is pure as well and safe to ``lax.scan``.
    """
    optimizer = spec.build()
    value_and_grad = jax.value_and_grad(objective, has_aux=True)

    if spec.needs_value_fn:
        def value_only(image):
            return objective(image)[0]

        def step(image, opt_state):
            (loss, aux), grad = value_and_grad(image)
            updates, opt_state = optimizer.update(
                grad, opt_state, image, value=loss, grad=grad, value_fn=value_only
            )
            image = optax.apply_updates(image, updates)
            return image, opt_state, aux
    else:
        def step(image, opt_state):
            (loss, aux), grad = value_and_grad(image)
            updates, opt_state = optimizer.update(grad, opt_state, image)
            image = optax.apply_updates(image, updates)
            return image, opt_state, aux

    return step, optimizer


def make_chunk_fn(step: StepFn, chunk_size: int):
    """``lax.scan`` ``chunk_size`` optimizer steps as one device computation.

    Per-step loss terms are stacked on device and fetched once per chunk —
    the only host<->device traffic in the hot loop is this small (chunk, k)
    float array plus the donated-carry handles.
    """

    def run_chunk(image, opt_state):
        def body(carry, _):
            image, opt_state = carry
            image, opt_state, aux = step(image, opt_state)
            return (image, opt_state), aux

        (image, opt_state), losses = jax.lax.scan(
            body, (image, opt_state), None, length=chunk_size
        )
        return image, opt_state, losses

    return run_chunk
