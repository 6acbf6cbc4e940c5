"""Numerical-safety utilities.

The reference's only runtime guard is a NaN check inside the encoder stack
that raises mid-forward (``src/encoders/pace.py:97-98``; SURVEY.md §5).
The jit-compatible equivalents here:

- :func:`nan_guard` — checkify-free finite assertion on a pytree that
  raises on the host after the step completes (use in tests/debug runs);
- :func:`debug_nans` — context manager enabling jax's global nan debugging
  (recompiles jitted functions with per-op checks);
- :func:`assert_finite_tree` — chex-based hard assertion for tests.
"""

from __future__ import annotations

import contextlib
from typing import Any, Iterator

import chex
import jax
import jax.numpy as jnp


def nan_guard(tree: Any, name: str = "value") -> None:
    """Host-side finite check of a computed pytree (blocks on the result)."""
    leaves = jax.tree.leaves(tree)
    for i, leaf in enumerate(leaves):
        if not bool(jnp.all(jnp.isfinite(leaf))):
            raise FloatingPointError(
                f"non-finite values detected in {name} (leaf {i}): "
                f"{jnp.sum(~jnp.isfinite(leaf))} bad elements of shape {leaf.shape}"
            )


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Enable jax_debug_nans within a scope (per-op NaN tracebacks)."""
    previous = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", previous)


def assert_finite_tree(tree: Any) -> None:
    chex.assert_tree_all_finite(tree)
