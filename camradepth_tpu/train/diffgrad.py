"""diffGradNorm as an optax GradientTransformation.

Re-implements the reference optimizer (/root/reference/src/models/
diffGradNorm.py:41-113): Adam moments + (a) AdaNorm gradient-norm correction
— a per-parameter EMA of the gradient L2 norm (0.95/0.05) that rescales
small-norm gradients up to the EMA (:81-88) — and (b) the diffGrad friction
coefficient dfc = sigmoid(|g_prev - g|) damping the first moment (:100-106).

State per parameter: exp_avg, exp_avg_sq, previous_grad (same shape) and a
scalar exp_grad_norm; one global step counter. All state is float32 and lives
in the optimizer pytree, so it shards over the fsdp axis like any other
state under pjit.

The reference's step size is lr * sqrt(1-b2^t) / (1-b1^t + 1e-8) applied via
addcdiv: p -= step_size * (exp_avg*dfc) / (sqrt(exp_avg_sq)+eps). NOTE the
reference does NOT bias-correct inside the denominator separately — we keep
its exact formula.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class DiffGradNormState(NamedTuple):
    step: chex.Array
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    previous_grad: optax.Updates
    exp_grad_norm: optax.Updates  # pytree of scalars


def scale_by_diffgrad_norm(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        return DiffGradNormState(
            step=jnp.zeros([], jnp.int32),
            exp_avg=zeros,
            exp_avg_sq=jax.tree.map(jnp.copy, zeros),
            previous_grad=jax.tree.map(jnp.copy, zeros),
            exp_grad_norm=jax.tree.map(
                lambda p: jnp.zeros([], jnp.float32), params
            ),
        )

    def update_fn(updates, state, params=None):
        del params
        step = state.step + 1

        def norm_correct(g, egn):
            g = g.astype(jnp.float32)
            gn = jnp.linalg.norm(g)
            new_egn = 0.95 * egn + 0.05 * gn
            g1 = jnp.where(new_egn > gn, g * new_egn / (gn + 1e-8), g)
            return g1, new_egn

        corrected = jax.tree.map(
            norm_correct, updates, state.exp_grad_norm,
            is_leaf=lambda x: isinstance(x, jnp.ndarray),
        )
        grad1 = jax.tree.map(lambda t: t[0], corrected,
                             is_leaf=lambda x: isinstance(x, tuple))
        new_egn = jax.tree.map(lambda t: t[1], corrected,
                               is_leaf=lambda x: isinstance(x, tuple))

        new_exp_avg = jax.tree.map(
            lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, grad1
        )
        new_exp_avg_sq = jax.tree.map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g.astype(jnp.float32)),
            state.exp_avg_sq,
            updates,
        )
        bc1 = 1.0 - b1 ** step.astype(jnp.float32)
        bc2 = 1.0 - b2 ** step.astype(jnp.float32)
        step_size = jnp.sqrt(bc2) / (bc1 + 1e-8)

        def direction(m, v, g, pg):
            # Positive (gradient-like) direction; optax.scale_by_learning_rate
            # downstream applies the -lr factor.
            dfc = jax.nn.sigmoid(jnp.abs(pg - g.astype(jnp.float32)))
            return step_size * (m * dfc) / (jnp.sqrt(v) + eps)

        new_updates = jax.tree.map(
            direction, new_exp_avg, new_exp_avg_sq, updates,
            state.previous_grad,
        )
        new_prev = jax.tree.map(lambda g: g.astype(jnp.float32), updates)
        return new_updates, DiffGradNormState(
            step=step,
            exp_avg=new_exp_avg,
            exp_avg_sq=new_exp_avg_sq,
            previous_grad=new_prev,
            exp_grad_norm=new_egn,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def diffgrad_norm(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Full optimizer: optional L2 (coupled, as the reference's
    ``grad += wd * p``, diffGradNorm.py:78-79) + diffGradNorm + lr."""
    txs = []
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(scale_by_diffgrad_norm(b1, b2, eps))
    txs.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*txs)
