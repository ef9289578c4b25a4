"""Varying-manual-axes (vma) helpers for shard_map compatibility.

Under `jax.shard_map(..., check_vma=True)` every value carries the set of
mesh axes it varies over. A `lax.while_loop` whose carry is initialized from
literal constants (`jnp.zeros(...)`) but whose body mixes in per-shard values
fails the carry type check: the input component is unvarying, the output
varying. The fix is to promote the constant initializers to the varying set
of a reference value (`jax.lax.pcast(..., to="varying")`); outside shard_map
the varying set is empty and this is a no-op, so solver code can apply it
unconditionally (used by lbfgs.minimize / ops.blbfgs.minimize_b, whose
while-loop carries are seeded from constants).
"""

from __future__ import annotations

import jax


def vary_like(template, *values):
    """Promote each value's vma set to match `template`'s (no-op outside
    shard_map or when the template is unvarying; axes a value already varies
    over are left alone). Returns a tuple (or a single value if one was
    given)."""
    vma = set(jax.typeof(template).vma)

    def promote(v):
        missing = tuple(sorted(vma - set(jax.typeof(v).vma)))
        return jax.lax.pcast(v, missing, to="varying") if missing else v

    values = tuple(promote(v) for v in values)
    return values[0] if len(values) == 1 else values
