"""Debug guards (SURVEY.md §5.2).

JAX's functional purity removes data races by construction (the reference's
equivalent tier is single-threaded Python); what remains worth guarding is
numeric health: ``debug_mode()`` enables NaN-checking on every jitted
computation for the scope of the context.
"""

from __future__ import annotations

import contextlib

import jax


def checked(fn, *, div: bool = True, nan: bool = True, oob: bool = True):
    """Wrap a jittable fn with checkify so NaN/divide/out-of-bounds errors
    inside compiled code surface as Python exceptions (SURVEY.md §5.2).

    Returns a function with the same signature; call .throw() semantics are
    handled internally (raises ValueError on the first failed check).
    """
    from jax.experimental import checkify

    errors = set()
    if div:
        errors |= checkify.div_checks
    if nan:
        errors |= checkify.nan_checks
    if oob:
        errors |= checkify.index_checks
    checked_fn = checkify.checkify(fn, errors=frozenset(errors))

    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


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
