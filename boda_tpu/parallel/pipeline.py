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


def _storage_shape(dims, plan):
    """Storage-form (shape, dtype) of a plan node (mirrors rtc_fwd
    _storage_zeros without allocating)."""
    import jax

    from ..engine.rtc_fwd import _storage_zeros
    sd = jax.eval_shape(lambda: _storage_zeros(dims, plan))
    return tuple(sd.shape), sd.dtype


def gpipe_plan_forward(plan, segments, weights: dict, x_mb, mesh,
                       axis: str = "pp"):
    """HETEROGENEOUS GPipe over a segmented imported ConvPipe plan
    (VERDICT r3 #6: real per-stage shapes/params, not same-shape toys).

    plan/segments: lower_pipe output + engine.segments.build_plan_segments
                   over it (stage k+1's in_node must be stage k's out_node)
    weights:       resolve_plan_weights dict
    x_mb:          (M, img, chan, y, x) LOGICAL NCHW microbatches; img must
                   equal the plan's lowered batch
    returns        (M, *out_storage_shape) storage-form outputs of the
                   last segment (replicated)

    Design, TPU-first: activations cross stage boundaries through ONE
    flat pad-to-max f32 ring riding `lax.ppermute` over ICI (bf16/f32
    boundary values upcast losslessly into the carrier); each device runs
    its stage via `lax.switch` on the pp axis index — all K stage
    programs compile into the single SPMD executable, one executes per
    tick, which is the honest price of heterogeneous stages under SPMD
    (paid once at compile, not per step). Per-stage weights travel as
    per-dtype flat pad-to-max (K, Wmax) buffers sharded over the pp axis,
    so each device's HBM holds only its own stage's params (+pad). The
    fill/steady/drain schedule is the scan in gpipe_forward's homogeneous
    ancestor: T = M + K - 1 ticks, stage 0 ingests microbatch t, device
    K-1 holds valid outputs at ticks K-1..T-1. Static shapes throughout."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..engine.rtc_fwd import _storage_in

    K = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    if len(segments) != K:
        raise RtErr(f"gpipe_plan_forward: {len(segments)} segments != "
                    f"mesh '{axis}' size {K}")
    for a, b in zip(segments, segments[1:]):
        if b.in_node != a.out_node:
            raise RtErr(f"gpipe_plan_forward: stage '{b.name}' consumes "
                        f"'{b.in_node}' but stage '{a.name}' produces "
                        f"'{a.out_node}' — stages must chain (regroup)")
    M = int(x_mb.shape[0])
    if M < 1:
        raise RtErr("gpipe_plan_forward: need at least one microbatch")

    # boundary storage specs; the ring must fit every stage output AND
    # the stage-0 input (it enters the ring at tick t on device 0)
    in_specs = [_storage_shape(plan.node_dims[s.in_node], plan)
                if s.in_node in plan.node_dims else None for s in segments]
    out_specs = [_storage_shape(plan.node_dims[s.out_node], plan)
                 for s in segments]
    if in_specs[0] is None:
        raise RtErr(f"gpipe_plan_forward: unknown input node "
                    f"'{segments[0].in_node}'")
    ring_n = max([int(np.prod(sh)) for sh, _dt in out_specs]
                 + [int(np.prod(in_specs[0][0]))])

    # per-stage weights → per-dtype flat pad-to-max (K, Wmax) buffers;
    # record (dtype, offset, size, shape) per weight for in-branch unpack
    wmeta = []  # per stage: [(dt_key, off, size, shape), ...]
    flats = []  # per stage: {dt_key: 1-D np array}
    # key by dtype NAME, not v.dtype.str: ml_dtypes bfloat16's .str is
    # '<V2' (void — np.zeros on it can't accept bf16 data, and any two
    # 2-byte custom dtypes would collide); keep the dtype object per key
    dt_objs: dict[str, np.dtype] = {}
    for s in segments:
        offs: dict[str, int] = {}
        parts: dict[str, list] = {}
        meta = []
        for n in s.weight_names:
            v = np.asarray(weights[n])
            dk = str(v.dtype)
            if dt_objs.setdefault(dk, v.dtype) != v.dtype:
                raise RtErr(f"gpipe_plan_forward: dtype name '{dk}' is "
                            f"ambiguous ({dt_objs[dk]} vs {v.dtype})")
            off = offs.get(dk, 0)
            meta.append((dk, off, v.size, v.shape))
            offs[dk] = off + v.size
            parts.setdefault(dk, []).append(v.reshape(-1))
        wmeta.append(meta)
        flats.append({dk: np.concatenate(ps) for dk, ps in parts.items()})
    dt_keys = sorted({dk for f in flats for dk in f})
    wbufs = {}
    for dk in dt_keys:
        wmax = max(f.get(dk, np.empty(0, dt_objs[dk])).size for f in flats)
        buf = np.zeros((K, max(wmax, 1)), dt_objs[dk])
        for k, f in enumerate(flats):
            v = f.get(dk)
            if v is not None:
                buf[k, :v.size] = v
        wbufs[dk] = buf

    def _branch(k):
        in_sh, in_dt = in_specs[k] if k == 0 else out_specs[k - 1]
        seg = segments[k]
        meta = wmeta[k]

        def br(x_flat, wloc):
            x = x_flat[:int(np.prod(in_sh))].astype(in_dt).reshape(in_sh)
            ws = [wloc[dk][off:off + size].reshape(shape)
                  for dk, off, size, shape in meta]
            y = seg.fn(x, *ws)
            yf = y.reshape(-1).astype(jnp.float32)
            return jnp.pad(yf, (0, ring_n - yf.shape[0]))
        return br

    branches = [_branch(k) for k in range(K)]
    perm = [(i, (i + 1) % K) for i in range(K)]
    out_sh, out_dt = out_specs[-1]
    out_n = int(np.prod(out_sh))

    def per_device(wloc, xs):
        w = jax.tree_util.tree_map(lambda p: p[0], wloc)
        idx = jax.lax.axis_index(axis)
        T = M + K - 1

        def tick(recv, t):
            mb_ix = jnp.clip(t, 0, M - 1)
            x_t = jax.lax.dynamic_index_in_dim(xs, mb_ix, axis=0,
                                               keepdims=False)
            cur_in = jnp.where(idx == 0, x_t, recv)
            y = jax.lax.switch(idx, branches, cur_in, w)
            nxt = jax.lax.ppermute(y, axis, perm)
            return nxt, y

        _, ys = jax.lax.scan(tick, jnp.zeros((ring_n,), jnp.float32),
                             jnp.arange(T))
        outs = jax.lax.dynamic_slice_in_dim(ys, K - 1, M, axis=0)
        mask = (idx == K - 1).astype(outs.dtype)
        return jax.lax.psum(outs * mask, axis)

    wspec = jax.tree_util.tree_map(lambda _p: P(axis), wbufs)
    try:
        fn = shard_map(per_device, mesh=mesh, in_specs=(wspec, P()),
                       out_specs=P(), check_vma=False)
    except TypeError:  # older jax spells it check_rep
        fn = shard_map(per_device, mesh=mesh, in_specs=(wspec, P()),
                       out_specs=P(), check_rep=False)
    wbufs_sh = jax.tree_util.tree_map(
        lambda p: jax.device_put(p, NamedSharding(mesh, P(axis))), wbufs)
    # microbatches → storage form → flat f32 pad-to-ring
    in0_n = int(np.prod(in_specs[0][0]))

    def prep(xb):
        xf = _storage_in(xb, plan).reshape(-1).astype(jnp.float32)
        return jnp.pad(xf, (0, ring_n - in0_n))
    xs_flat = jax.vmap(prep)(jnp.asarray(x_mb))
    outs = fn(wbufs_sh, xs_flat)  # (M, ring_n)
    return outs[:, :out_n].astype(out_dt).reshape((M,) + out_sh)
