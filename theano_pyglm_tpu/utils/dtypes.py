"""Precision policy.

TPU production runs float32 (with bf16 design tensors in the Pallas path);
verification mode (SURVEY.md §7 "Numerics", the 1e-6 agreement bar) runs the
same code under ``jax.config.update('jax_enable_x64', True)`` on CPU. Code
therefore never hardcodes float32 for model-facing arrays — it asks
:func:`default_float`, which follows the x64 flag.
"""

import jax
import jax.numpy as jnp

__all__ = ["default_float"]


def default_float():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
