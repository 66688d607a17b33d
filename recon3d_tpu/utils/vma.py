"""shard_map varying-manual-axes (vma) plumbing helpers.

Under `jax.shard_map(..., check_vma=True)` every array carries the set of
mesh axes it varies over. Freshly created constants (jnp.zeros & friends)
are unvarying, so using them as lax.scan carry inits alongside varying xs
trips the "carry input and carry output must have equal types" check. The
fix is to `jax.lax.pvary` the init onto the same axes as the data it will
be combined with — a no-op outside shard_map (vma is empty there).
"""
from __future__ import annotations

import jax


def vary_like(x: jax.Array, like: jax.Array) -> jax.Array:
    """Mark `x` as varying over the same manual mesh axes as `like`.

    Outside shard_map (or with check_vma off) this is the identity.
    """
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        missing = tuple(a for a in vma
                        if a not in getattr(jax.typeof(x), "vma", frozenset()))
        if missing:
            # pcast(..., to='varying') supersedes the deprecated pvary
            if hasattr(jax.lax, "pcast"):
                return jax.lax.pcast(x, missing, to="varying")
            return jax.lax.pvary(x, missing)
    return x
