"""Parameter initializers replicating the reference's init laws.

The reference mixes three regimes (SURVEY.md §7.1):

- VSSG applies ``trunc_normal_(std=.02)`` to every ``nn.Linear`` weight and
  zeros its bias (``/root/reference/ITS/models/vmamba_layers.py:931-938``).
- Raw ``nn.Parameter`` stacks (x_proj, dt_proj) keep their construction-time
  init: PyTorch-Linear default ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` for
  x_proj (``vmamba_layers.py:471-477``) and ``U(-dt_rank^-0.5, dt_rank^-0.5)``
  for dt_proj weight with a softplus-inverse bias (``:510-535``).
- Convs keep PyTorch's default kaiming-uniform(a=sqrt(5)), which reduces to
  ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` — reproduced here as uniform
  variance-scaling with scale 1/3.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

# trunc_normal(std=0.02): jax truncates at +-2 sigma; torch's default bounds
# (+-2 absolute = +-100 sigma at std 0.02) are effectively untruncated, but the
# mass difference is < 5e-5 — negligible.
trunc_normal_02 = nn.initializers.truncated_normal(stddev=0.02)

# PyTorch nn.Linear / nn.Conv2d default: kaiming_uniform(a=sqrt(5)) ==
# U(-1/sqrt(fan_in), +1/sqrt(fan_in)).  variance_scaling uniform draws from
# U(-sqrt(3 s / fan_in), ...) so s = 1/3 gives the torch bound.
torch_default = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """PyTorch Linear/Conv bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def uniform_pm(bound: float):
    """U(-bound, +bound) initializer."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def dt_bias_init(dt_min=0.001, dt_max=0.1, dt_init_floor=1e-4):
    """Softplus-inverse init so softplus(bias) ~ LogUniform(dt_min, dt_max).

    Mirrors ``SS2D.dt_init`` (``vmamba_layers.py:510-535``): draw
    dt ~ exp(U(log dt_min, log dt_max)), clamp at dt_init_floor, store
    softplus^{-1}(dt) = dt + log(-expm1(-dt)).
    """

    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, jnp.float32)
        dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.maximum(dt, dt_init_floor)
        inv = dt + jnp.log(-jnp.expm1(-dt))
        return inv.astype(dtype)

    return init


def a_log_init(d_state: int, copies: int):
    """S4D-real init: A_log = log(1..N) per channel, tiled over K directions
    (``vmamba_layers.py:537-552``).  Shape (copies * d_inner, d_state)."""

    def init(key, shape, dtype=jnp.float32):
        del key
        total, N = shape
        assert N == d_state
        row = jnp.log(jnp.arange(1, N + 1, dtype=jnp.float32))
        return jnp.broadcast_to(row, (total, N)).astype(dtype)

    return init
