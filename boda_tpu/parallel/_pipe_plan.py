"""Shared machinery for plan-level GPipe (forward + training step).

Split out of parallel/pipeline.py: both `gpipe_plan_forward` and
`gpipe_plan_train_step` need the same segment validation, ring sizing,
per-dtype flat weight packing, and per-stage branch builders. See
pipeline.py for the design narrative (VERDICT r3 #6 / r4 #4).
"""

from __future__ import annotations

from ..core.error import RtErr


class PlanPipeCtx:
    """Everything x-independent about a (plan, segments, weights, mesh)
    pipeline: ring size, per-dtype flat (K, Wmax) weight buffers with
    per-weight (name, dtype-key, offset, size, shape) metadata, the K
    stage branch fns over (flat ring value, local weight buffers), and
    the forward permutation."""

    __slots__ = ("K", "axis", "in_specs", "out_specs", "ring_n", "wmeta",
                 "wbufs", "dt_objs", "branches", "perm", "out_sh",
                 "out_dt", "out_n", "in0_n", "plan", "segments", "mesh")


def build_plan_pipe_ctx(plan, segments, weights: dict, mesh,
                        axis: str = "pp",
                        what: str = "gpipe_plan_forward") -> PlanPipeCtx:
    import jax.numpy as jnp
    import numpy as np

    from .pipeline import _storage_shape

    c = PlanPipeCtx()
    c.plan, c.segments, c.mesh, c.axis = plan, segments, mesh, axis
    c.K = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    if len(segments) != c.K:
        raise RtErr(f"{what}: {len(segments)} segments != "
                    f"mesh '{axis}' size {c.K}")
    for a, b in zip(segments, segments[1:]):
        if b.in_node != a.out_node:
            raise RtErr(f"{what}: stage '{b.name}' consumes "
                        f"'{b.in_node}' but stage '{a.name}' produces "
                        f"'{a.out_node}' — stages must chain (regroup)")

    # boundary storage specs; the ring must fit every stage output AND
    # the stage-0 input (it enters the ring at tick t on device 0)
    c.in_specs = [_storage_shape(plan.node_dims[s.in_node], plan)
                  if s.in_node in plan.node_dims else None
                  for s in segments]
    c.out_specs = [_storage_shape(plan.node_dims[s.out_node], plan)
                   for s in segments]
    if c.in_specs[0] is None:
        raise RtErr(f"{what}: unknown input node "
                    f"'{segments[0].in_node}'")
    c.ring_n = max([int(np.prod(sh)) for sh, _dt in c.out_specs]
                   + [int(np.prod(c.in_specs[0][0]))])

    # per-stage weights → per-dtype flat pad-to-max (K, Wmax) buffers;
    # record (name, dtype, offset, size, shape) per weight for in-branch
    # unpack and for grad re-association (train step).
    # Keyed by dtype NAME, not v.dtype.str: ml_dtypes bfloat16's .str is
    # '<V2' (void — np.zeros on it can't accept bf16 data, and any two
    # 2-byte custom dtypes would collide); keep the dtype object per key
    wmeta = []   # per stage: [(name, dt_key, off, size, shape), ...]
    flats = []   # per stage: {dt_key: 1-D np array}
    dt_objs: dict[str, np.dtype] = {}
    all_names = [n for s in segments for n in s.weight_names]
    if len(all_names) != len(set(all_names)):
        dups = sorted({n for n in all_names if all_names.count(n) > 1})
        raise RtErr(f"{what}: weight node(s) {dups} appear in more than "
                    f"one stage — unpack_grads keeps only the last "
                    f"stage's contribution, silently dropping gradient "
                    f"terms; segment the plan so each weight has one "
                    f"owning stage")
    for s in segments:
        offs: dict[str, int] = {}
        parts: dict[str, list] = {}
        meta = []
        for n in s.weight_names:
            v = np.asarray(weights[n])
            dk = str(v.dtype)
            if dt_objs.setdefault(dk, v.dtype) != v.dtype:
                raise RtErr(f"{what}: dtype name '{dk}' is "
                            f"ambiguous ({dt_objs[dk]} vs {v.dtype})")
            off = offs.get(dk, 0)
            meta.append((n, dk, off, v.size, v.shape))
            offs[dk] = off + v.size
            parts.setdefault(dk, []).append(v.reshape(-1))
        wmeta.append(meta)
        flats.append({dk: np.concatenate(ps) for dk, ps in parts.items()})
    dt_keys = sorted({dk for f in flats for dk in f})
    wbufs = {}
    for dk in dt_keys:
        wmax = max(f.get(dk, np.empty(0, dt_objs[dk])).size for f in flats)
        buf = np.zeros((c.K, max(wmax, 1)), dt_objs[dk])
        for k, f in enumerate(flats):
            v = f.get(dk)
            if v is not None:
                buf[k, :v.size] = v
        wbufs[dk] = buf
    c.wmeta, c.wbufs, c.dt_objs = wmeta, wbufs, dt_objs

    def _branch(k):
        in_sh, in_dt = c.in_specs[k] if k == 0 else c.out_specs[k - 1]
        seg = segments[k]
        meta = wmeta[k]
        n_in = int(np.prod(in_sh))

        def br(x_flat, wloc):
            x = x_flat[:n_in].astype(in_dt).reshape(in_sh)
            ws = [wloc[dk][off:off + size].reshape(shape)
                  for _n, dk, off, size, shape in meta]
            y = seg.fn(x, *ws)
            yf = y.reshape(-1).astype(jnp.float32)
            return jnp.pad(yf, (0, c.ring_n - yf.shape[0]))
        return br

    c.branches = [_branch(k) for k in range(c.K)]
    c.perm = [(i, (i + 1) % c.K) for i in range(c.K)]
    c.out_sh, c.out_dt = c.out_specs[-1]
    c.out_n = int(np.prod(c.out_sh))
    c.in0_n = int(np.prod(c.in_specs[0][0]))
    return c


def prep_microbatches(c: PlanPipeCtx, x_mb):
    """(M, logical NCHW) microbatches → (M, ring_n) flat f32 storage."""
    import jax
    import jax.numpy as jnp

    from ..engine.rtc_fwd import _storage_in

    def prep(xb):
        xf = _storage_in(xb, c.plan).reshape(-1).astype(jnp.float32)
        return jnp.pad(xf, (0, c.ring_n - c.in0_n))
    return jax.vmap(prep)(jnp.asarray(x_mb))


def shard_weight_bufs(c: PlanPipeCtx):
    """Commit the (K, Wmax) weight buffers sharded over the pp axis."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.tree_util.tree_map(
        lambda p: jax.device_put(p, NamedSharding(c.mesh, P(c.axis))),
        c.wbufs)


def float_key_split(c: PlanPipeCtx):
    """(float dtype keys that receive grads, ride-along keys). bf16/f32
    master weights train; a prequant-int8 inference plan's int8/scale
    buffers ride as constants."""
    f_keys = sorted(dk for dk, dt in c.dt_objs.items()
                    if dt.kind == "f" or dk.startswith("bfloat"))
    return f_keys, sorted(dk for dk in c.wbufs if dk not in f_keys)


def make_bwd_branches(c: PlanPipeCtx):
    """Per-stage VJP fns over (x_flat, dy_flat, float-w, nonfloat-w) →
    (dx_flat, d float-w) — the backward counterparts of c.branches."""
    import jax

    def _bwd_branch(k):
        br = c.branches[k]

        def bb(x_flat, dy_flat, wf, wnf):
            def f(xf, wfl):
                return br(xf, {**wfl, **wnf})
            _y, vjp = jax.vjp(f, x_flat, wf)
            return vjp(dy_flat)
        return bb
    return [_bwd_branch(k) for k in range(c.K)]


def unpack_grads(c: PlanPipeCtx, gbufs, f_keys):
    """(K, Wmax) per-dtype grad buffers → {weight_name: array}."""
    grads = {}
    for k, meta in enumerate(c.wmeta):
        for n, dk, off, size, shape in meta:
            if dk in f_keys:
                grads[n] = gbufs[dk][k, off:off + size].reshape(shape)
    return grads


def make_shard_map(c: PlanPipeCtx, per_device, n_extra_replicated: int,
                   out_specs):
    """shard_map with (K,Wmax)-sharded weights + replicated extras."""
    import jax
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    wspec = jax.tree_util.tree_map(lambda _p: P(c.axis), c.wbufs)
    in_specs = (wspec,) + (P(),) * n_extra_replicated
    try:
        return shard_map(per_device, mesh=c.mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:  # older jax spells it check_rep
        return shard_map(per_device, mesh=c.mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)
