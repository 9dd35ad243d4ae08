"""Prodigy optimizer as an optax GradientTransformation.

The reference trains with ``pytorch_optimizer.Prodigy`` at lr=1
(config.yaml:39-43) — a parameter-free D-adaptation variant (Mishchenko &
Defazio, "Prodigy: An Expeditiously Adaptive Parameter-Free Learner",
arXiv:2306.06101). Without it, the reference's default recipe diverges, so a
faithful optax implementation is required (SURVEY.md hard part b).

Algorithm (matching the public prodigyopt/pytorch-optimizer semantics with
``use_bias_correction=False``, ``safeguard_warmup=False``, ``decouple=True``
defaults):

    d_lr = d * lr * bc(k)                     (bc = 1 unless bias correction)
    numerator = β3·numerator + (d/d0)·d_lr·Σ⟨g, p0 − p⟩
    m = β1·m + (1−β1)·d·g
    v = β2·v + (1−β2)·d²·g²
    s = β3·s + (d/d0)·d_lr·g
    denom_sum = Σ|s|
    d̂ = d_coef · numerator / denom_sum
    d  = max(d, d̂)  while d == d0 ;  d_max = max(d_max, d̂) ;
    d  = min(d_max, d·growth_rate)
    p ← p·(1 − d_lr·weight_decay) − d_lr · m / (√v + d·ε)

All d/numerator updates are global scalars reduced across the whole
parameter pytree, so the transformation is fully jittable and shards cleanly
under pjit (the reductions become psums over the data mesh).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class ProdigyState(NamedTuple):
    step: jnp.ndarray          # int32
    d: jnp.ndarray             # f32 scalar
    d_max: jnp.ndarray
    d_numerator: jnp.ndarray
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    s: optax.Updates
    p0: optax.Params


def prodigy(learning_rate: float = 1.0,
            betas: tuple = (0.9, 0.999),
            beta3: Optional[float] = None,
            eps: float = 1e-8,
            weight_decay: float = 0.0,
            decouple: bool = True,
            use_bias_correction: bool = False,
            safeguard_warmup: bool = False,
            d0: float = 1e-6,
            d_coef: float = 1.0,
            growth_rate: float = float("inf")) -> optax.GradientTransformation:
    """Prodigy as an optax transform; returns parameter *updates* (deltas)."""
    beta1, beta2 = betas
    beta3_val = beta3 if beta3 is not None else beta2 ** 0.5

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return ProdigyState(
            step=jnp.zeros([], jnp.int32),
            d=jnp.asarray(d0, jnp.float32),
            d_max=jnp.asarray(d0, jnp.float32),
            d_numerator=jnp.zeros([], jnp.float32),
            exp_avg=zeros,
            exp_avg_sq=jax.tree_util.tree_map(jnp.zeros_like, params),
            s=jax.tree_util.tree_map(jnp.zeros_like, params),
            # A real copy — p0 must not alias the (donatable) param buffers.
            p0=jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True),
                                      params),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("prodigy requires params")
        k = state.step
        d = state.d

        if use_bias_correction:
            bias_correction = (jnp.sqrt(1.0 - beta2 ** (k + 1).astype(jnp.float32))
                               / (1.0 - beta1 ** (k + 1).astype(jnp.float32)))
        else:
            bias_correction = 1.0
        d_lr = d * learning_rate * bias_correction

        # global numerator increment: Σ ⟨g, p0 − p⟩
        dot_terms = jax.tree_util.tree_map(
            lambda g, p, p0: jnp.sum(g.astype(jnp.float32)
                                     * (p0 - p).astype(jnp.float32)),
            grads, params, state.p0)
        dot_sum = jax.tree_util.tree_reduce(jnp.add, dot_terms, 0.0)
        d_numerator = (beta3_val * state.d_numerator
                       + (d / d0) * d_lr * dot_sum)

        exp_avg = jax.tree_util.tree_map(
            lambda m, g: beta1 * m + (1.0 - beta1) * d * g, state.exp_avg, grads)
        exp_avg_sq = jax.tree_util.tree_map(
            lambda v, g: beta2 * v + (1.0 - beta2) * d * d * g * g,
            state.exp_avg_sq, grads)
        s_alpha = (d / d0) * (d if safeguard_warmup else d_lr)
        s = jax.tree_util.tree_map(
            lambda s_, g: beta3_val * s_ + s_alpha * g, state.s, grads)
        abs_sums = jax.tree_util.tree_map(
            lambda s_: jnp.sum(jnp.abs(s_.astype(jnp.float32))), s)
        d_denom = jax.tree_util.tree_reduce(jnp.add, abs_sums, 0.0)

        def new_d(_):
            d_hat = d_coef * d_numerator / d_denom
            d1 = jnp.where(d == d0, jnp.maximum(d, d_hat), d)
            d_max = jnp.maximum(state.d_max, d_hat)
            growth = jnp.asarray(growth_rate, jnp.float32)
            return jnp.minimum(d_max, d1 * growth), d_max

        # d update is skipped when denom is 0 (all-zero grads so far) or lr<=0.
        do_update = jnp.logical_and(d_denom > 0.0, learning_rate > 0.0)
        d_new, d_max_new = jax.lax.cond(
            do_update, new_d, lambda _: (d, state.d_max), operand=None)

        # prodigyopt skips the parameter update entirely while d_denom == 0
        # (all-zero gradients so far).
        apply_scale = do_update.astype(jnp.float32)

        def param_update(m, v, p):
            denom = jnp.sqrt(v.astype(jnp.float32)) + d_new * eps
            delta = -d_lr * m.astype(jnp.float32) / denom
            if decouple:
                # weight_decay may be a traced hyperparameter; the term is a
                # no-op at 0.0 so it is applied unconditionally.
                delta = delta - d_lr * weight_decay * p.astype(jnp.float32)
            return (apply_scale * delta).astype(p.dtype)

        updates = jax.tree_util.tree_map(param_update, exp_avg, exp_avg_sq,
                                         params)
        new_state = ProdigyState(
            step=k + 1, d=d_new, d_max=d_max_new, d_numerator=d_numerator,
            exp_avg=exp_avg, exp_avg_sq=exp_avg_sq, s=s, p0=state.p0)
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)
