"""shard_map compatibility: `jax.shard_map` (public since jax 0.4.35,
`check_vma` keyword) with fallback to the deprecated
`jax.experimental.shard_map` (`check_rep`) for older runtimes. The
sharded Stage-B programs disable replication checking either way (the
halo stitches intentionally produce per-shard values)."""
from __future__ import annotations


def shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map as sm
    except ImportError:
        sm = None
    if sm is not None:
        try:
            return sm(fn, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False)
        except TypeError:
            return sm(fn, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_rep=False)
    from jax.experimental.shard_map import shard_map as esm
    return esm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
               check_rep=False)
