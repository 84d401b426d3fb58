"""Activation-function factory.

Mirrors the selection semantics of the reference factory
(``utils/src/net_utils.py:23-45``) including its substring matching and
branch order ('leaky_relu' is tested before 'relu' because ``'relu' in
'leaky_relu'`` is true) and its slope of 0.20 for leaky ReLU.

Returns a pure ``jax.Array -> jax.Array`` function, or ``None`` for 'linear'.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

Activation = Optional[Callable[[jax.Array], jax.Array]]


def _leaky_relu_020(x: jax.Array) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope=0.20)


def activation_func(name: str) -> Activation:
    if "linear" in name:
        return None
    elif "leaky_relu" in name:
        return _leaky_relu_020
    elif "relu" in name:
        return jax.nn.relu
    elif "elu" in name:
        return jax.nn.elu
    elif "sigmoid" in name:
        return jax.nn.sigmoid
    else:
        raise ValueError(f"Unsupported activation function: {name}")


def resolve_activation(act) -> Activation:
    """Accept either a name (str), a callable, or None."""
    if act is None or callable(act):
        return act
    return activation_func(act)
