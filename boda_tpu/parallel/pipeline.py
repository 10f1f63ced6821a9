"""Pipeline parallelism: GPipe-style microbatch schedule over a 'pp' mesh
axis.

The reference is single-device (SURVEY §2.8 marks PP "not required for
parity; optional for large nets"); this is the TPU-native optional layer:
stage s of a K-stage network lives on device s of the pp axis (stage
params stacked on a leading dim and sharded over pp), activations flow
stage-to-stage with `lax.ppermute` over ICI, and a `lax.scan` over
M + K - 1 ticks drives the classic pipeline fill/steady/drain schedule —
compiler-friendly control flow, no data-dependent Python.

Constraint (the usual GPipe shape rule): every stage maps activations of
one fixed shape to the same shape, so the inter-stage ring buffer is
static. Output = stage_{K-1}(...stage_0(x)) per microbatch.
"""

from __future__ import annotations

from ..core.error import RtErr


def gpipe_forward(stage_fn, stacked_params, x_mb, mesh, axis: str = "pp"):
    """Run a K-stage pipeline over mesh axis `axis`.

    stage_fn(params, x) -> y        (same shape as x)
    stacked_params: pytree, each leaf with leading dim K (stage-major),
                    sharded over `axis`
    x_mb: (M, mb, ...) microbatches (replicated)
    returns (M, mb, ...) outputs (replicated)
    """
    import jax
    import jax.numpy as jnp
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    K = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    M = x_mb.shape[0]
    if M < 1:
        raise RtErr("gpipe_forward: need at least one microbatch")
    perm = [(i, (i + 1) % K) for i in range(K)]

    def per_device(params_local, xs):
        # params_local leaves: (1, ...) — this device's stage params
        w = jax.tree_util.tree_map(lambda p: p[0], params_local)
        idx = jax.lax.axis_index(axis)
        T = M + K - 1

        def tick(recv, t):
            # stage 0 ingests microbatch t (clamped; masked out-of-range)
            mb_ix = jnp.clip(t, 0, M - 1)
            x_t = jax.lax.dynamic_index_in_dim(xs, mb_ix, axis=0,
                                               keepdims=False)
            cur_in = jnp.where(idx == 0, x_t, recv)
            y = stage_fn(w, cur_in)
            nxt = jax.lax.ppermute(y, axis, perm)
            return nxt, y

        _, ys = jax.lax.scan(tick, jnp.zeros_like(xs[0]), jnp.arange(T))
        # device K-1 holds the completed outputs at ticks K-1 .. T-1
        outs = jax.lax.dynamic_slice_in_dim(ys, K - 1, M, axis=0)
        # broadcast the last stage's outputs to every device
        mask = (idx == K - 1).astype(outs.dtype)
        return jax.lax.psum(outs * mask, axis)

    pspec = jax.tree_util.tree_map(lambda _p: P(axis), stacked_params)
    try:
        fn = shard_map(per_device, mesh=mesh,
                       in_specs=(pspec, P()), out_specs=P(),
                       check_vma=False)
    except TypeError:  # older jax spells it check_rep
        fn = shard_map(per_device, mesh=mesh,
                       in_specs=(pspec, P()), out_specs=P(),
                       check_rep=False)
    # commit params with the stage-major sharding
    params_sh = jax.tree_util.tree_map(
        lambda p: jax.device_put(p, NamedSharding(mesh, P(axis))),
        stacked_params)
    return fn(params_sh, x_mb)


def stack_stage_params(per_stage_params: list):
    """[{name: arr}, ...] per stage → stacked pytree with leading dim K.
    All stages must share one parameter structure (GPipe shape rule)."""
    import jax
    import numpy as np
    if not per_stage_params:
        raise RtErr("stack_stage_params: no stages")
    return jax.tree_util.tree_map(
        lambda *leaves: np.stack(leaves), *per_stage_params)
