"""CLI self-check for the pipeline-parallel layer (`pp_test`).

Reference parity role: the reference shipped a CLI test mode per
subsystem (test_compute / test_dense / ... — /root/reference/src/
test_compute.cc:240+, SURVEY §4's test strategy); the PP layer gets the
same surface. `pp_test` segments a lowered plan, runs the GPipe and/or
1F1B training schedules over a `pp` mesh, and verifies loss + weight
grads against the sequential segments — the same checks pytest and
`dryrun_multichip` carry, exposed as a golden-able CLI mode.

Run on real devices, or `--local-devices=K` for the virtual CPU mesh
(the multi-chip-without-a-cluster rig, as `mh_test`)."""

from __future__ import annotations

from ..core.config import Attr
from ..core.error import RtErr
from ..core.has_main import HasMain, mode

_DEFAULT_STAGES = {
    "mini": "a:conv1|b:cccp1+pool1|c:conv2+drop|d:fc-conv+gpool",
    "resnet-50": "stem:conv1+pool1+res2|s3:res3|s4:res4|"
                 "head:res5+pool5+fc1000-conv",
}


@mode("pp_test", help="pipeline-parallel self-check: GPipe/1F1B training "
                      "schedules over a pp mesh vs sequential grads")
class PpTest(HasMain):
    model = Attr(str, default="mini")
    model_opts = Attr(str, default="", help="extra model-builder kwargs "
                                            "as a lexp")
    batch = Attr(int, default=2, help="per-microbatch image count")
    stages = Attr(str, default="",
                  help="stage spec (default: per-model table)")
    pp = Attr(int, default=4, help="pipeline stages = mesh 'pp' size")
    microbatches = Attr(int, default=6)
    schedule = Attr(str, default="both", help="gpipe | 1f1b | both")
    local_devices = Attr(int, default=0,
                         help="if >0: force JAX_PLATFORMS=cpu with this "
                              "many virtual devices (run the check "
                              "without a multi-chip host)")
    tol = Attr(float, default=1e-4, help="max rel grad diff vs sequential")

    def main(self):
        if self.local_devices:
            from .multihost import force_local_cpu_devices
            force_local_cpu_devices(self.local_devices)
        import numpy as np

        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from ..engine.lower import lower_pipe, resolve_plan_weights
        from ..engine.rtc_fwd import _storage_in, _storage_out
        from ..engine.segments import build_plan_segments
        from ..graph.modes import _load_pipe
        from .pipeline import gpipe_plan_train_step, plan_train_step_1f1b

        if self.schedule not in ("gpipe", "1f1b", "both"):
            raise RtErr(f"pp_test: unknown schedule '{self.schedule}'")
        stages = self.stages or _DEFAULT_STAGES.get(self.model)
        if not stages:
            raise RtErr(f"pp_test: no default stage spec for model "
                        f"'{self.model}' — pass --stages")
        pipe = _load_pipe(self)
        plan = lower_pipe(pipe)
        weights = resolve_plan_weights(plan, pipe.op_params)
        segs = build_plan_segments(plan, weights, stages)
        if len(segs) != self.pp:
            raise RtErr(f"pp_test: stage spec yields {len(segs)} "
                        f"segments != pp={self.pp}")
        devices = jax.devices()
        if len(devices) < self.pp:
            raise RtErr(f"pp_test: {len(devices)} devices < pp={self.pp} "
                        f"(use --local-devices)")
        mesh = Mesh(np.array(devices[:self.pp]), ("pp",))
        out_node = segs[-1].out_node
        n_cls = plan.node_dims[out_node]["chan"]
        d = pipe.get_data_img_dims()
        M = self.microbatches
        rng = np.random.RandomState(0)
        x_mb = (rng.randn(M, *d.shape) * 0.3).astype(np.float32)
        labels = rng.randint(0, n_cls, size=(M, d.shape[0])).astype(np.int32)

        def loss_fn(y_storage, labs):
            y = _storage_out(y_storage, plan.node_dims[out_node], plan)
            logits = y[:, :, 0, 0].astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=1)
            return -jnp.mean(jnp.take_along_axis(logp, labs[:, None], 1))

        def seq_loss(w):
            tot = jnp.float32(0)
            for i in range(M):
                v = _storage_in(x_mb[i], plan)
                for s in segs:
                    v = s.fn(v, *[w[n] for n in s.weight_names])
                tot = tot + loss_fn(v, jnp.asarray(labels[i]))
            return tot

        want_loss, want_g = jax.value_and_grad(seq_loss)(
            {n: weights[n] for s in segs for n in s.weight_names})

        steps = {"gpipe": gpipe_plan_train_step,
                 "1f1b": plan_train_step_1f1b}
        names = [self.schedule] if self.schedule != "both" \
            else ["gpipe", "1f1b"]
        fails = []  # (name, loss_rd, grad_mrd) of each FAILING schedule
        for name in names:
            loss_pp, g_pp = steps[name](
                plan, segs, weights, x_mb, labels, mesh, loss_fn)
            l_rd = abs(float(loss_pp) - float(want_loss)) \
                / max(abs(float(want_loss)), 1e-12)
            g_mrd = 0.0
            for n in sorted(want_g):
                a = np.asarray(g_pp[n], np.float64)
                b = np.asarray(want_g[n], np.float64)
                g_mrd = max(g_mrd, float(np.abs(a - b).max()
                                         / max(np.abs(b).max(), 1e-12)))
            ok = l_rd <= self.tol and g_mrd <= self.tol \
                and set(g_pp) == set(want_g)
            if not ok:
                fails.append((name, l_rd, g_mrd))
            print(f"pp_test {name} model={self.model} pp={self.pp} "
                  f"M={M}: {'PASSED' if ok else 'FAILED'} "
                  f"({len(want_g)} weight grads vs sequential)")
        if fails:
            raise RtErr("pp_test: FAILED " + "; ".join(
                f"{n} (loss_rd={lr:.2e} grad_mrd={gm:.2e})"
                for n, lr, gm in fails))
