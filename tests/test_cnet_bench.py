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
