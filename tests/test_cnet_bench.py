"""cnet_bench / cnet_tune whole-net benchmark modes."""
def test_cnet_tune_mode(tmp_path):
    """whole-net tune search: runs the grid, writes the winner record."""
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        "(mode=cnet_tune,model=mini,iters=3,reps=1,"
        "tunes=((use_culibs=1),(use_culibs=1,prec=bf16,layout=nhwc)),"
        f"wisdom_out_fn=net.wis,boda_output_dir={tmp_path})")
    txt = (tmp_path / "net.wis").read_text()
    assert txt.startswith("(model=mini,batch=1,tune=(use_culibs=1")


def test_cnet_tune_batch_sweep(tmp_path):
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        "(mode=cnet_tune,model=mini,iters=2,reps=1,batches=1 2,"
        "tunes=((use_culibs=1)),"
        f"wisdom_out_fn=net.wis,boda_output_dir={tmp_path})")
    txt = (tmp_path / "net.wis").read_text()
    assert "batch=" in txt and "tune=(use_culibs=1)" in txt


def test_stage_probe_mini(capsys):
    """cnet_stage_probe: per-stage isolated floors (the ceiling-proof
    harness). On CPU just pin segmentation + output format on mini."""
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        "(mode=cnet_stage_probe,model=mini,batch=1,iters=3,reps=1,"
        "whole_net=0,stages=stem:conv1|mid:cccp1+conv2+cat2+pool|"
        "head:drop+fc-conv+gpool+prob)")
    out = capsys.readouterr().out
    assert "stem" in out and "mid" in out and "head" in out
    assert "SUM" in out

def test_stage_probe_bwd(capsys):
    """bwd=1 probes per-stage TRAINING floors (fwd + input-grad +
    weight-grad): grads flow through every segment AND the whole-net
    grad path; 3x-fwd flops reported. On CPU pins wiring, not timing."""
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        "(mode=cnet_stage_probe,model=mini,batch=1,iters=3,reps=1,bwd=1,"
        "op_tune=(use_culibs=1,prec=bf16,layout=nhwc,s2d=0),"
        "stages=stem:conv1|mid:cccp1+conv2+cat2+pool|"
        "head:drop+fc-conv+gpool+prob)")
    out = capsys.readouterr().out
    assert "stem" in out and "WHOLE" in out and "SUM" in out


def test_stage_probe_concat_in_stage(tmp_path, capsys):
    """A Concat whose output buffer is first touched in-seg by its copy
    write-slices (inception-style stage) must segment cleanly: the copy
    INOUT target zero-inits in-seg (as build_fused_forward does) instead
    of masquerading as an external stage input; in-place first-touchers
    (dropout) still count as the real stage input."""
    from boda_tpu.core.has_main import create_and_run_has_main
    from boda_tpu.graph.caffe_io import write_prototxt
    from boda_tpu.models.zoo import NetBuilder
    b = NetBuilder("cat-net", 1, 3, 16, 16)
    b.conv("c1", 8, 3, 1, 1)
    src = b.cur
    b.conv("br/a", 4, 1, in_node=src)
    oa = b.cur
    b.conv("br/b", 4, 3, pad=1, in_node=src)
    ob = b.cur
    b.concat("br/cat", [oa, ob])
    b.conv("c2", 8, 1)
    pipe = b.done()
    write_prototxt(pipe, tmp_path / "n.prototxt")
    create_and_run_has_main(
        f"(mode=cnet_stage_probe,ptt_fn={tmp_path}/n.prototxt,batch=1,"
        f"iters=2,reps=1,whole_net=0,stages=s1:c1|s2:br+c2)")
    out = capsys.readouterr().out
    assert "s1" in out and "s2" in out and "SUM" in out


def test_pyra_bench_mode(capsys):
    """pyra_bench: host blf-pack + device packed-bin forward throughput
    (BASELINE config #5 surface). On CPU pin auto out-node pick, bin
    batch wiring, and the report format; timings are noise here."""
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        "(mode=pyra_bench,model=mini,"
        "in_dims=(dims=(img=1,chan=3,y=48,x=48)),"
        "bin_sz=96 96,interval=2,min_sz=24,iters=3,reps=1,pack_reps=1)")
    out = capsys.readouterr().out
    assert "pyra_bench mini" in out
    assert "bins=2x96x96" in out and "scales=3" in out
    assert "pack_ms=" in out and "overlapped=" in out


def test_train_bench_mode(capsys):
    """train_bench: fwd+bwd+SGD chained-slope harness runs (CPU: timings
    are noise; what's pinned is grads flow through the fused program and
    the report format)."""
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        "(mode=train_bench,model=mini,iters=3,reps=1)")
    out = capsys.readouterr().out
    assert "train_bench mini" in out and "3x-fwd est" in out


def test_train_bench_momentum(capsys):
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        "(mode=train_bench,model=mini,iters=3,reps=1,optimizer=momentum)")
    out = capsys.readouterr().out
    assert "opt=momentum" in out


def test_remat_forward_matches_fused():
    """build_remat_forward (gradient checkpointing over plan segments):
    forward values and weight-grads must match the un-checkpointed fused
    program exactly (same ops, recomputed); dropped-tail (softmax) and
    chaining validation covered."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from boda_tpu.core.error import RtErr
    from boda_tpu.engine.lower import lower_pipe, resolve_plan_weights
    from boda_tpu.engine.rtc_fwd import build_fused_forward
    from boda_tpu.engine.segments import build_remat_forward
    from boda_tpu.models.zoo import NetBuilder
    from boda_tpu.ops.cnn_variants import make_op_tune

    b = NetBuilder("rm", 2, 3, 16, 16)
    b.conv("conv1", 8, 3, 1, 1).pool("pool1", 2, 2)
    b.conv("res2a", 16, 3, 1, 1)
    b.conv("res3a", 16, 3, 1, 1)
    b.conv("fc-conv", 10, 1, relu=False)
    b.pool("gpool", 0, 1, avg=True, global_=True)
    b.softmax("prob")
    pipe = b.done(seed=4)
    plan = lower_pipe(pipe, make_op_tune("(use_culibs=1,prec=bf16,"
                                         "layout=nhwc)"),
                      fused_storage=True)
    weights = resolve_plan_weights(plan, pipe.op_params)
    spec = "stem:conv1+pool1|s2:res2|s3:res3|head:fc-conv+gpool"
    fwd_r = build_remat_forward(plan, weights, spec)
    assert fwd_r.out_node == "gpool"
    assert any("prob" in t for t in fwd_r.dropped_tail)
    fwd_f = build_fused_forward(plan, keep_all_nodes=True)
    d = pipe.get_data_img_dims()
    x = (np.random.RandomState(0).randn(*d.shape) * 0.3).astype(np.float32)

    got = np.asarray(fwd_r({"data": x}, weights)["gpool"])
    want = np.asarray(fwd_f({"data": x}, weights)["gpool"])
    np.testing.assert_array_equal(got, want)  # same ops, bit-identical

    def loss_r(w):
        return fwd_r({"data": x}, w)["gpool"] \
            .astype(jnp.float32).ravel().sum()

    def loss_f(w):
        return fwd_f({"data": x}, w)["gpool"] \
            .astype(jnp.float32).ravel().sum()

    gr = jax.jit(jax.grad(loss_r))(weights)
    gf = jax.jit(jax.grad(loss_f))(weights)
    # not bit-exact: checkpoint's recompute changes XLA fusion/accumulation
    # order, so an ulp-level conv-output difference can flip a near-zero
    # relu mask bit (measured: segments-without-checkpoint are bit-exact
    # vs fused; checkpoint adds ~3e-4 on one bias grad)
    for k in gf:
        np.testing.assert_allclose(np.asarray(gr[k]), np.asarray(gf[k]),
                                   rtol=1e-2, atol=5e-3, err_msg=k)

    # non-trailing coverage gap errors (res2 left out)
    with pytest.raises(RtErr, match="not covered"):
        build_remat_forward(plan, weights,
                            "stem:conv1+pool1|s3:res3|head:fc-conv+gpool")
    # non-chaining spec errors
    with pytest.raises(RtErr, match="must chain"):
        build_remat_forward(plan, weights,
                            "stem:conv1+pool1|oops:res3|s2:res2|"
                            "head:fc-conv+gpool")


def test_train_bench_remat(capsys):
    """train_bench remat=1 runs the checkpointed step (logits loss) and
    reports remat in its line."""
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        "(mode=train_bench,model=mini,iters=3,reps=1,remat=1,"
        "remat_stages=stem:conv1|mid:cccp1+conv2+cat2+pool|"
        "head:drop+fc-conv+gpool)")
    out = capsys.readouterr().out
    assert "remat=1" in out and "train_bench mini" in out


def test_cnet_train_mode(tmp_path, capsys):
    """cnet_train: synthetic-data training reduces loss; loss curve and
    caffemodel export written."""
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        f"(mode=cnet_train,model=mini,"
        f"in_dims=(dims=(img=4,chan=3,y=32,x=32)),steps=8,lr=0.1,"
        f"log_every=4,loss_out_fn=loss.txt,weights_out_fn=w.caffemodel,"
        f"boda_output_dir={tmp_path})")
    out = capsys.readouterr().out
    assert "cnet_train mini b4" in out
    losses = [float(v) for v in
              (tmp_path / "loss.txt").read_text().split()]
    assert len(losses) == 8 and losses[-1] < losses[0]
    assert (tmp_path / "w.caffemodel").stat().st_size > 1000


def test_train_export_reimport_eval(tmp_path, capsys):
    """Full loop: generate a labeled LMDB -> train mini on it ->
    export prototxt+caffemodel -> re-import through the caffe front-end
    -> eval accuracy with test_lmdb. Overfitting 8 images must reach
    high top-1 (validates training AND the export/import round-trip)."""
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        f"(mode=gen_lmdb,out_dir={tmp_path}/lmdb8,num_imgs=8,"
        f"num_classes=8,ysz=32,xsz=32)")
    create_and_run_has_main(
        f"(mode=cnet_train,model=mini,"
        f"in_dims=(dims=(img=4,chan=3,y=32,x=32)),"
        f"stream=(mode=lmdb-src,fn={tmp_path}/lmdb8,mean=128,"
        f"scale=0.0078125),"
        f"steps=150,lr=0.02,optimizer=momentum,log_every=50,"
        f"weights_out_fn=t.caffemodel,prototxt_out_fn=t.prototxt,"
        f"boda_output_dir={tmp_path})")
    capsys.readouterr()
    create_and_run_has_main(
        f"(mode=test_lmdb,ptt_fn={tmp_path}/t.prototxt,"
        f"trained_fn={tmp_path}/t.caffemodel,"
        f"in_dims=(dims=(img=4,chan=3,y=32,x=32)),"
        f"src=(mode=lmdb-src,fn={tmp_path}/lmdb8,mean=128,"
        f"scale=0.0078125))")
    out = capsys.readouterr().out
    import re
    m = re.search(r"top_1_acc=([0-9.]+)", out)
    assert m, out
    assert float(m.group(1)) >= 0.75, out


def test_train_bench_adam(capsys):
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        "(mode=train_bench,model=mini,iters=3,reps=1,optimizer=adam)")
    out = capsys.readouterr().out
    assert "opt=adam" in out


def test_cnet_train_snapshot_resume_synthetic(tmp_path):
    """Solver snapshot/resume: a run interrupted at step 4 and resumed to
    8 must reproduce the uninterrupted 8-step run BIT-IDENTICALLY
    (weights + adam state + RNG state all restored; same jit program)."""
    from boda_tpu.core.has_main import create_and_run_has_main
    base = (f"(mode=cnet_train,model=mini,"
            f"in_dims=(dims=(img=4,chan=3,y=32,x=32)),lr=0.05,"
            f"optimizer=adam,log_every=100,loss_out_fn=loss.txt,")
    create_and_run_has_main(
        base + f"steps=8,boda_output_dir={tmp_path}/full)")
    full = (tmp_path / "full/loss.txt").read_text()
    create_and_run_has_main(
        base + f"steps=4,snapshot_every=4,boda_output_dir={tmp_path}/a)")
    assert (tmp_path / "a/snapshot.boda").exists()
    create_and_run_has_main(
        base + f"steps=8,resume_fn={tmp_path}/a/snapshot.boda,"
               f"boda_output_dir={tmp_path}/b)")
    assert (tmp_path / "b/loss.txt").read_text() == full


def test_cnet_train_snapshot_resume_stream(tmp_path):
    """Stream resume restores the data position deterministically
    (skip-with-wrap replay): interrupted+resumed lmdb training matches
    the uninterrupted loss curve exactly."""
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        f"(mode=gen_lmdb,out_dir={tmp_path}/lmdb6,num_imgs=6,"
        f"num_classes=6,ysz=32,xsz=32)")
    base = (f"(mode=cnet_train,model=mini,"
            f"in_dims=(dims=(img=4,chan=3,y=32,x=32)),"
            f"stream=(mode=lmdb-src,fn={tmp_path}/lmdb6,mean=128,"
            f"scale=0.0078125),lr=0.02,optimizer=momentum,"
            f"log_every=100,loss_out_fn=loss.txt,")
    create_and_run_has_main(
        base + f"steps=6,boda_output_dir={tmp_path}/full)")
    full = (tmp_path / "full/loss.txt").read_text()
    # 6 steps x batch 4 over a 6-image set: the snapshot at step 3 sits
    # mid-epoch (12 consumed = 2 wraps) — the interesting resume case
    create_and_run_has_main(
        base + f"steps=3,snapshot_every=3,boda_output_dir={tmp_path}/a)")
    create_and_run_has_main(
        base + f"steps=6,resume_fn={tmp_path}/a/snapshot.boda,"
               f"boda_output_dir={tmp_path}/b)")
    assert (tmp_path / "b/loss.txt").read_text() == full


def test_cnet_train_snapshot_errors(tmp_path):
    """Wrong-optimizer resume and non-snapshot files error loudly."""
    import pytest

    from boda_tpu.core.error import RtErr
    from boda_tpu.core.has_main import create_and_run_has_main
    base = (f"(mode=cnet_train,model=mini,"
            f"in_dims=(dims=(img=4,chan=3,y=32,x=32)),lr=0.05,")
    create_and_run_has_main(
        base + f"steps=2,snapshot_every=2,optimizer=sgd,"
               f"boda_output_dir={tmp_path})")
    with pytest.raises(RtErr, match="optimizer 'sgd'"):
        create_and_run_has_main(
            base + f"steps=4,optimizer=adam,"
                   f"resume_fn={tmp_path}/snapshot.boda,"
                   f"boda_output_dir={tmp_path}/x)")
    with pytest.raises(RtErr, match="already at step"):
        create_and_run_has_main(
            base + f"steps=2,optimizer=sgd,"
                   f"resume_fn={tmp_path}/snapshot.boda,"
                   f"boda_output_dir={tmp_path}/y)")
    bogus = tmp_path / "not_a_snapshot.bin"
    bogus.write_bytes(b"hello world")
    with pytest.raises(RtErr, match="bad magic"):
        create_and_run_has_main(
            base + f"steps=4,optimizer=sgd,resume_fn={bogus},"
                   f"boda_output_dir={tmp_path}/z)")
    # a half-written snapshot (crash artifact) must be a clean RtErr,
    # not a numpy/struct traceback
    good = (tmp_path / "snapshot.boda").read_bytes()
    trunc = tmp_path / "truncated.boda"
    trunc.write_bytes(good[:len(good) // 2])
    with pytest.raises(RtErr, match="truncated or corrupt"):
        create_and_run_has_main(
            base + f"steps=4,optimizer=sgd,resume_fn={trunc},"
                   f"boda_output_dir={tmp_path}/t)")
    # mismatched net variant (same weight names, different dims): loud
    # error instead of a silent reshape. Doctor a real snapshot so one
    # weight keeps its size but swaps its shape (what resuming against a
    # surgically-altered net looks like)
    from boda_tpu.apps.train import read_snapshot, write_snapshot
    snap = read_snapshot(tmp_path / "snapshot.boda")
    w = dict(snap["weights"])
    k = "conv1_filts"
    w[k] = w[k].reshape(w[k].shape[::-1])
    write_snapshot(tmp_path / "doctored.boda", step=snap["step"],
                   optimizer="sgd", consumed=snap["consumed"], weights=w,
                   vel={}, losses=snap["losses"],
                   rng_state=snap["rng_state"])
    with pytest.raises(RtErr, match="different net variant"):
        create_and_run_has_main(
            base + f"steps=4,optimizer=sgd,"
                   f"resume_fn={tmp_path}/doctored.boda,"
                   f"boda_output_dir={tmp_path}/v)")


def test_cnet_train_adam_reduces_loss(tmp_path):
    """Adam on a fixed learnable dataset (synthetic draws NEW random
    labels each step — nothing to learn there)."""
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        f"(mode=gen_lmdb,out_dir={tmp_path}/lmdb8,num_imgs=8,"
        f"num_classes=8,ysz=32,xsz=32)")
    create_and_run_has_main(
        f"(mode=cnet_train,model=mini,"
        f"in_dims=(dims=(img=4,chan=3,y=32,x=32)),"
        f"stream=(mode=lmdb-src,fn={tmp_path}/lmdb8,mean=128,"
        f"scale=0.0078125),steps=30,lr=0.002,"
        f"optimizer=adam,log_every=30,loss_out_fn=loss.txt,"
        f"boda_output_dir={tmp_path})")
    losses = [float(v) for v in (tmp_path / "loss.txt").read_text().split()]
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])
