"""Robust loss functions and IRLS weights.

Faithful to the reference formulas (cpp/include/ps_optimizer/Optimizer.cpp:140-186)
for all five losses — including the reference's unscaled Cauchy loss
log(1 + (r/lambda)^2). Unlike the reference config parser (which silently
drops `trunc_l2`/`tukey` due to an `==` typo at cpp/include/ConfigLoader.h:126,130),
all five are actually selectable here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

L2 = 0
CAUCHY = 1
HUBER = 2
TUKEY = 3
TRUNC_L2 = 4

_NAMES = {"l2": L2, "cauchy": CAUCHY, "huber": HUBER, "tukey": TUKEY, "trunc_l2": TRUNC_L2}


def loss_from_name(name: str) -> int:
    try:
        return _NAMES[name]
    except KeyError:
        raise ValueError(f"unsupported loss function {name!r}") from None


def irls_weight(r: jax.Array, loss: int, lam: float) -> jax.Array:
    """Per-residual IRLS weight w(r) (Optimizer.cpp:140-161)."""
    lam = jnp.asarray(lam, dtype=r.dtype)
    if loss == CAUCHY:
        return 1.0 / (1.0 + jnp.square(r / lam))
    if loss == TUKEY:
        w = jnp.square(1.0 - jnp.square(r / lam))
        return jnp.where(jnp.square(r) < lam * lam, w, 0.0)
    if loss == HUBER:
        w = lam / jnp.maximum(jnp.abs(r), 1e-12)
        return jnp.where(jnp.square(r) < lam * lam, 1.0, w)
    if loss == TRUNC_L2:
        return jnp.where(jnp.square(r) < lam * lam, 1.0, 0.0)
    return jnp.ones_like(r)


def loss_value(r: jax.Array, loss: int, lam: float) -> jax.Array:
    """Elementwise robust loss rho(r) (Optimizer.cpp:164-186); caller sums."""
    lam = jnp.asarray(lam, dtype=r.dtype)
    if loss == CAUCHY:
        return jnp.log1p(jnp.square(r / lam))
    if loss == TUKEY:
        v = 1.0 - (1.0 - jnp.square(r / lam)) ** 3
        return jnp.where(jnp.square(r) < lam * lam, v, 1.0)
    if loss == HUBER:
        quad = 0.5 * jnp.square(r)
        lin = lam * (jnp.abs(r) - 0.5 * lam)
        return jnp.where(jnp.square(r) < lam * lam, quad, lin)
    if loss == TRUNC_L2:
        return jnp.square(jnp.clip(r, -lam, lam))
    return jnp.square(r)
