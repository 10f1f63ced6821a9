"""Plan segmentation: partition a lowered Plan into sequential stage
segments, each a jittable fn over the fused program's INTERIOR storage
form (same NHWC/bf16 edges as the shipped whole-net program).

Extracted from the cnet_stage_probe mode so pipeline parallelism can ride
the same grouping (VERDICT r3 #6: GPipe over the *imported* pipe, not toy
stages). Reference context: the reference's conv_pipe had no stage
notion — its per-op granularity is covered by ops_prof; stage grouping is
the unit the TPU build uses for ceiling proofs and pp sharding.
"""

from __future__ import annotations

from ..core.error import RtErr


class PlanSegment:
    """One stage: `fn(x, *ws) -> y` where x is the in_node's value in
    storage form, ws are the `weight_names` values (resolve_plan_weights
    order), and y is the out_node's storage-form value."""

    __slots__ = ("name", "steps", "fn", "weight_names", "in_node",
                 "out_node", "flops", "zero_init")

    def __init__(self, name, steps, fn, weight_names, in_node, out_node,
                 flops, zero_init):
        self.name = name
        self.steps = steps
        self.fn = fn
        self.weight_names = weight_names
        self.in_node = in_node
        self.out_node = out_node
        self.flops = flops
        self.zero_init = zero_init


def parse_stages_spec(spec: str) -> list[tuple[str, tuple[str, ...]]]:
    """'name:prefix[+prefix...]|...' → [(name, prefixes), ...]."""
    groups = []
    for part in spec.split("|"):
        name, _, prefs = part.partition(":")
        groups.append((name, tuple(p for p in prefs.split("+") if p)))
    return groups


def build_plan_segments(plan, weights: dict, stages_spec: str,
                        what: str = "plan segmentation"):
    """Partition plan.steps into stage segments by call-tag prefix.

    Each segment must consume exactly ONE external activation node (its
    input); shortcut edges must stay in-segment — the same constraint the
    stage probe enforces. Empty groups are dropped. Returns
    [PlanSegment, ...] in spec order."""
    from ..ops.registry import get_template

    groups = parse_stages_spec(stages_spec)

    def group_of(tag):
        for name, prefs in groups:
            if any(tag.startswith(p) for p in prefs):
                return name
        return None

    segs: dict[str, list] = {name: [] for name, _ in groups}
    for s in plan.steps:
        g = group_of(s.call_tag)
        if g is not None:
            segs[g].append(s)

    out = []
    for name, _prefs in groups:
        seg = segs[name]
        if not seg:
            continue
        built = []
        seg_weights: list[str] = []
        produced: set[str] = set()
        consumed: list[str] = []
        zero_init: list[str] = []
        for s in seg:
            tmpl = get_template(s.sig.func_name)
            rfs = tmpl.check_args(s.sig)
            built.append((tmpl.build(rfs), tmpl, s))
            io_args = set(tmpl.io_args())
            for an in tmpl.in_args() + tmpl.io_args():
                n = s.arg_nodes.get(an)
                if n is None or n in produced:
                    continue
                if n in weights:
                    if n not in seg_weights:
                        seg_weights.append(n)
                elif an in io_args and s.sig.func_name == "copy":
                    # first touch is the Concat write-slice target (copy
                    # ignores prior content at its chan range): zero-init
                    # in-seg, exactly as build_fused_forward does on first
                    # touch. Other io first-touchers (in-place
                    # relu/dropout) READ content — those stay external
                    zero_init.append(n)
                    produced.add(n)
                else:
                    if n not in consumed:
                        consumed.append(n)
            for an in tmpl.out_args() + tmpl.io_args():
                if an in s.arg_nodes:
                    produced.add(s.arg_nodes[an])
        if len(consumed) != 1:
            raise RtErr(f"{what}: stage '{name}' must consume exactly one "
                        f"external activation node, got "
                        f"{consumed or '[none]'} — adjust the stages= "
                        f"grouping so shortcut edges stay in-stage")
        in_node = consumed[0]
        out_node = [s.arg_nodes[an] for fn, tmpl, s in built[::-1]
                    for an in tmpl.out_args() + tmpl.io_args()
                    if an in s.arg_nodes][0]
        flops = sum(get_template(s.sig.func_name).flops(
            get_template(s.sig.func_name).check_args(s.sig)) for s in seg)

        from .rtc_fwd import _storage_zeros

        def seg_fn(x, *ws, _built=tuple(built), _wn=tuple(seg_weights),
                   _in=in_node, _zi=tuple(zero_init), _out=out_node):
            vals = dict(zip(_wn, ws))
            vals[_in] = x
            for n in _zi:  # INOUT targets (concat out buffers)
                vals[n] = _storage_zeros(plan.node_dims[n], plan)
            for fn, tmpl, s in _built:
                ins = [vals[s.arg_nodes[an]]
                       for an in tmpl.in_args() + tmpl.io_args()
                       if an in s.arg_nodes]
                outs = fn(*ins)
                if not isinstance(outs, (tuple, list)):
                    outs = (outs,)
                for an, ov in zip(tmpl.out_args() + tmpl.io_args(), outs):
                    if an in s.arg_nodes:
                        vals[s.arg_nodes[an]] = ov
            return vals[_out]

        out.append(PlanSegment(name, seg, seg_fn, tuple(seg_weights),
                               in_node, out_node, flops, tuple(zero_init)))
    return out
