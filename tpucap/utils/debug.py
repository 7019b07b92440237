"""Debug guards (SURVEY.md §5.2).

JAX's functional purity removes data races by construction (the reference's
equivalent tier is single-threaded Python); what remains worth guarding is
numeric health: ``debug_mode()`` enables NaN-checking on every jitted
computation for the scope of the context.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    old_nans = jax.config.jax_debug_nans
    try:
        jax.config.update("jax_debug_nans", nans)
        if disable_jit:
            with jax.disable_jit():
                yield
        else:
            yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
