"""Data-stream framework tests (reference: data-stream.{H,cc} composable
stage semantics — sources get empty blocks, invalid block = EOF, seek,
start-stop-skip/merge/sync/fold/flatten/batch combinators)."""

import numpy as np
import pytest

from boda_tpu.core.error import RtErr
from boda_tpu.io.data_stream import (DataBlock, make_data_stream,
                                     read_all_blocks)


def spec(s):
    ds = make_data_stream(s)
    return ds


def test_test_gen_and_eof():
    ds = spec("(mode=test-gen,num=3,sz=4)")
    bs = read_all_blocks(ds)
    assert len(bs) == 3
    assert bs[0].nda.v.tolist() == [0, 1, 2, 3]
    assert bs[2].nda.v[0] == 200.0
    assert [b.timestamp_ns for b in bs] == [0, 1000, 2000]
    # post-EOF reads stay invalid
    assert not ds.proc_block(DataBlock()).valid()


def test_start_stop_skip():
    ds = spec("(mode=start-stop-skip,src=(mode=test-gen,num=10),"
              "start_block=2,skip_blocks=1,num_to_read=3)")
    bs = read_all_blocks(ds)
    assert [b.frame_ix for b in bs] == [2, 4, 6]


def test_text_and_csv_src(tmp_path):
    fn = tmp_path / "x.txt"
    fn.write_text("hello\nworld\n")
    bs = read_all_blocks(spec(f"(mode=text-src,fn={fn})"))
    assert len(bs) == 2
    assert bytes(bs[0].nda.v.tobytes()) == b"hello"
    cfn = tmp_path / "x.csv"
    cfn.write_text("a,b,c\n1,2,3\n4,5,6\n")
    bs = read_all_blocks(spec(f"(mode=csv-src,fn={cfn},skip_rows=1)"))
    assert len(bs) == 2
    assert bs[1].nda.v.tolist() == [4.0, 5.0, 6.0]


def test_raw_file_src_and_seek(tmp_path):
    fn = tmp_path / "r.bin"
    fn.write_bytes(bytes(range(32)))
    ds = spec(f"(mode=raw-file-src,fn={fn},frame_sz=8)")
    bs = read_all_blocks(ds)
    assert len(bs) == 4 and bs[1].nda.v[0] == 8
    assert ds.seek_to_block(2)
    b = ds.proc_block(DataBlock())
    assert b.frame_ix == 2 and b.nda.v[0] == 16
    with pytest.raises(RtErr, match="not a multiple"):
        make_data_stream(f"(mode=raw-file-src,fn={fn},frame_sz=7)")


def test_merge_and_flatten():
    ds = spec("(mode=merge,srcs=((mode=test-gen,num=3,tag=a),"
              "(mode=test-gen,num=5,tag=b)))")
    bs = read_all_blocks(ds)
    assert len(bs) == 3  # shortest source ends the merge
    assert set(bs[0].named) == {"a", "b"}
    flat = read_all_blocks(spec(
        "(mode=flatten,src=(mode=merge,srcs=((mode=test-gen,num=2,tag=a),"
        "(mode=test-gen,num=2,tag=b))))"))
    assert [b.tag for b in flat] == ["a", "b", "a", "b"]


def test_ts_merge_orders_by_timestamp():
    ds = spec("(mode=ts-merge,srcs=((mode=test-gen,num=3,dt_ns=1000,t0_ns=500),"
              "(mode=test-gen,num=3,dt_ns=1000,t0_ns=0)))")
    bs = read_all_blocks(ds)
    ts = [b.timestamp_ns for b in bs]
    assert ts == sorted(ts) == [0, 500, 1000, 1500, 2000, 2500]


def test_sync_nearest_timestamp():
    # secondary at 0,1000,2000,... primary at 100,1100,...: nearest matches
    ds = spec("(mode=sync,primary=(mode=test-gen,num=3,dt_ns=1000,t0_ns=100,"
              "tag=p),secondary=((mode=test-gen,num=10,dt_ns=1000,tag=s)),"
              "max_delta_ns=200)")
    bs = read_all_blocks(ds)
    assert len(bs) == 3
    for b in bs:
        assert abs(b.get_sdb("s").timestamp_ns - b.timestamp_ns) <= 200


def test_fold_and_sort():
    bs = read_all_blocks(spec("(mode=fold,src=(mode=test-gen,num=5),n=2)"))
    assert [b.num_subblocks() for b in bs] == [2, 2, 1]
    # sort a deliberately interleaved ts-stream
    bs = read_all_blocks(spec(
        "(mode=sort-by-ts,window=8,src=(mode=merge,srcs="
        "((mode=test-gen,num=3,t0_ns=900),(mode=test-gen,num=3,t0_ns=0))))"))
    # merge makes composite blocks; just check it runs and yields 3
    assert len(bs) == 3


def test_stamp_and_crop():
    ds = spec("(mode=pipe,stages=((mode=test-gen,num=2,sz=4),"
              "(mode=stamp,t0_ns=77,dt_ns=3)))")
    bs = read_all_blocks(ds)
    assert [b.timestamp_ns for b in bs] == [77, 80]


def test_batch_stacks_blocks():
    ds = spec("(mode=batch,src=(mode=test-gen,num=7,sz=4),n=3)")
    bs = read_all_blocks(ds)
    assert len(bs) == 2  # 7//3, partial dropped
    assert bs[0].nda.dims.names()[0] == "img"
    assert bs[0].nda.v.shape == (3, 4)
    np.testing.assert_array_equal(bs[1].nda.v[0],
                                  np.arange(4, dtype=np.float32) + 300.0)


def test_sinks(tmp_path):
    out = tmp_path / "o.txt"
    ds = spec(f"(mode=pipe,stages=((mode=test-gen,num=2),"
              f"(mode=text-sink,fn={out})))")
    read_all_blocks(ds)
    lines = out.read_text().splitlines()
    assert len(lines) == 2 and "tag=test-gen" in lines[0]
    npy = tmp_path / "o.npy"
    ds = spec(f"(mode=pipe,stages=((mode=test-gen,num=3,sz=2),"
              f"(mode=npy-sink,fn={npy})))")
    read_all_blocks(ds)
    ds.proc_block(DataBlock())  # EOF propagates to sink -> save
    assert np.load(npy).shape == (3, 2)


def test_scan_mode(capsys, tmp_path):
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        "(mode=scan_data_stream,stream=(mode=test-gen,num=3,sz=8))",
        global_vars={})
    out = capsys.readouterr().out
    assert "block[2]:" in out
    assert "scan-data-stream: 3 blocks, 96 bytes" in out


def test_unknown_stream_mode_err():
    with pytest.raises(RtErr, match="unknown mode"):
        make_data_stream("(mode=nonexistent-stream)")


def test_seq_concatenates():
    ds = spec("(mode=seq,srcs=((mode=test-gen,num=2,tag=a),"
              "(mode=test-gen,num=3,tag=b)))")
    bs = read_all_blocks(ds)
    assert [b.tag for b in bs] == ["a", "a", "b", "b", "b"]
    assert [b.frame_ix for b in bs] == [0, 1, 2, 3, 4]


def test_hash_check_roundtrip(tmp_path):
    fn = tmp_path / "h.digests"
    # record
    read_all_blocks(spec(f"(mode=pipe,stages=((mode=test-gen,num=3,sz=8),"
                         f"(mode=hash-check,fn={fn},write=1)))"))
    assert len(fn.read_text().splitlines()) == 3
    # verify passes on identical stream
    read_all_blocks(spec(f"(mode=pipe,stages=((mode=test-gen,num=3,sz=8),"
                         f"(mode=hash-check,fn={fn})))"))
    # verify fails on altered stream content (different block shape)
    with pytest.raises(RtErr, match="hash-check: block 0 mismatch"):
        read_all_blocks(spec(
            f"(mode=pipe,stages=((mode=test-gen,num=3,sz=9),"
            f"(mode=hash-check,fn={fn})))"))


def test_img_dir_src(tmp_path):
    pytest.importorskip("PIL")
    from boda_tpu.io.img import save_img
    import numpy as np
    for i in range(3):
        save_img(tmp_path / f"im{i}.png",
                 np.full((8, 8, 3), i * 40, np.uint8))
    bs = read_all_blocks(spec(f"(mode=img-dir-src,dir={tmp_path})"))
    assert len(bs) == 3
    assert bs[0].nda.dims.names() == ("y", "x", "chan")
    assert bs[1].nda.v[0, 0, 0] == 40


def test_device_preproc_and_prefetch():
    """Device-side batched preprocessing (resize+BGR+mean+CHW in one jit)
    matches the host path; PrefetchFeeder yields all batches."""
    import numpy as np
    from boda_tpu.core.dims import Dims
    from boda_tpu.io.device_preproc import (PrefetchFeeder,
                                            preprocess_batch_nda)
    from boda_tpu.io.img import img_to_chw
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, 32, 32, 3), np.uint8)
    d = Dims.make(img=2, chan=3, y=32, x=32)
    got = preprocess_batch_nda(imgs, d)
    want = np.stack([img_to_chw(im) for im in imgs])
    np.testing.assert_allclose(got.v, want, atol=1e-4)
    # resize path + prefetch iteration
    batches = [rng.randint(0, 255, (2, 48, 40, 3), np.uint8) for _ in range(3)]
    feeder = PrefetchFeeder(iter(batches), out_y=32, out_x=32)
    outs = [np.asarray(b) for b in feeder]
    assert len(outs) == 3 and outs[0].shape == (2, 3, 32, 32)


def test_adj_angle():
    from boda_tpu.core.dims import NDA, Dims
    v = np.array([0.0, 90.0, 180.0, 359.0, -270.0, 720.0], np.float32)
    db = DataBlock(nda=NDA(Dims.make(tn="float", v=6), v))
    got = spec("(mode=adj-angle)").proc_block(db).nda.v
    np.testing.assert_allclose(got, [0, 90, -180, -1, 90, 0], atol=1e-5)
    got = spec("(mode=adj-angle,adj=10)").proc_block(db).nda.v
    np.testing.assert_allclose(got, [10, 100, -170, 9, 100, 10], atol=1e-5)
    got = spec("(mode=adj-angle,negate=1)").proc_block(db).nda.v
    np.testing.assert_allclose(got, [0, -90, -180, 1, -90, 0], atol=1e-5)
    sub_only = DataBlock()
    sub_only.set_sdb(DataBlock(nda=db.nda, tag="s"))
    with pytest.raises(RtErr, match="nda was null"):
        spec("(mode=adj-angle)").proc_block(sub_only)


def test_cnet_infer_stage(tmp_path):
    """cnet-infer: image stream blocks flow through the rtc engine in-
    process (capture_classify parity); each block gains a (top_k,2)
    [class,prob] 'pred' subblock + a label meta line, and is
    deterministic across engines (ref vs rtc agree on argmax)."""
    pytest.importorskip("PIL")
    import numpy as np

    import boda_tpu.apps.stream_infer  # noqa: F401 (registers cnet-infer)
    from boda_tpu.io.img import save_img
    rng = np.random.RandomState(3)
    for i in range(3):
        save_img(tmp_path / f"im{i}.png",
                 rng.randint(0, 255, (48, 48, 3)).astype(np.uint8))
    out = []
    for eng in ("rtc", "ref"):
        ds = spec(f"(mode=pipe,stages=((mode=img-dir-src,dir={tmp_path}),"
                  f"(mode=cnet-infer,model=mini,top_k=3,"
                  f"conv_fwd=(engine={eng}))))")
        bs = read_all_blocks(ds)
        assert len(bs) == 3
        for b in bs:
            pred = b.get_sdb("pred")
            assert pred is not None and pred.nda.v.shape == (3, 2)
            assert b.meta.startswith("class_")
            assert abs(pred.nda.v[:, 1].sum()) <= 1.001
        out.append([int(b.get_sdb("pred").nda.v[0, 0]) for b in bs])
    assert out[0] == out[1]  # engines agree on top-1

def test_cnet_infer_float_and_rgba_blocks():
    """cnet-infer layout/dtype handling: (a) already-preprocessed float
    CHW blocks (lmdb-src applies caffe transform_param mean/scale) are
    fed UNTOUCHED — no uint8 coercion (negatives would wrap) and no
    second mean subtraction; (b) RGBA frames drop alpha (reference img_t
    is RGBA); (c) wrong-size float blocks error instead of resampling."""
    import numpy as np

    import boda_tpu.apps.stream_infer  # noqa: F401 (registers cnet-infer)
    from boda_tpu.core.dims import NDA, Dims
    from boda_tpu.io.img import img_to_chw

    st = spec("(mode=cnet-infer,model=mini,top_k=3,conv_fwd=(engine=ref))")
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)

    def block(v, **dims):
        return DataBlock(NDA(Dims.make(tn="float" if v.dtype.kind == "f"
                                       else "uint8_t", **dims), v),
                         frame_ix=0, timestamp_ns=0)

    # uint8 HWC path (the baseline)
    b_u8 = st.proc_block(block(img, y=32, x=32, chan=3))
    p_u8 = b_u8.get_sdb("pred").nda.v
    # the SAME image hand-preprocessed to a float CHW block (what a
    # mean-subtracted lmdb-src block looks like, incl. negatives)
    chw = img_to_chw(img)
    assert chw.min() < 0
    b_f = st.proc_block(block(chw, chan=3, y=32, x=32))
    p_f = b_f.get_sdb("pred").nda.v
    np.testing.assert_allclose(p_f, p_u8, rtol=1e-5, atol=1e-6)
    # RGBA: alpha dropped, same prediction as RGB
    rgba = np.concatenate([img, np.full((32, 32, 1), 255, np.uint8)], axis=2)
    p_a = st.proc_block(block(rgba, y=32, x=32, chan=4)).get_sdb("pred").nda.v
    np.testing.assert_allclose(p_a, p_u8, rtol=1e-5, atol=1e-6)
    # raw-pixel FLOAT frames (video-src: RGB in [0,255] as float32) take
    # the image path — resized + mean-subtracted like uint8 frames
    raw_f = np.transpose(img, (2, 0, 1)).astype(np.float32)
    p_rf = st.proc_block(block(raw_f, chan=3, y=32, x=32)).get_sdb("pred").nda.v
    np.testing.assert_allclose(p_rf, p_u8, rtol=1e-5, atol=1e-6)
    # explicit override beats the auto heuristic
    st1 = spec("(mode=cnet-infer,model=mini,top_k=3,preprocessed=1,"
               "conv_fwd=(engine=ref))")
    p_o = st1.proc_block(block(chw, chan=3, y=32, x=32)).get_sdb("pred").nda.v
    np.testing.assert_allclose(p_o, p_u8, rtol=1e-5, atol=1e-6)
    # wrong-size float block: loud error, not silent garbage
    with pytest.raises(RtErr, match="float block spatial"):
        st.proc_block(block(chw[:, :16, :16].copy(), chan=3, y=16, x=16))


def test_cnet_infer_feats_montage(tmp_path):
    """cnet-infer feats_node: channel-map montage rides the stream as an
    'img' subblock (capture_feats parity, cap_app.cc:298) and is
    img-sink-able."""
    pytest.importorskip("PIL")
    import numpy as np

    import boda_tpu.apps.stream_infer  # noqa: F401 (registers cnet-infer)
    import boda_tpu.io.disp  # noqa: F401 (registers img-sink)
    from boda_tpu.io.img import save_img
    rng = np.random.RandomState(5)
    save_img(tmp_path / "im0.png",
             rng.randint(0, 255, (40, 40, 3)).astype(np.uint8))
    ds = spec(f"(mode=pipe,stages=((mode=img-dir-src,dir={tmp_path}),"
              f"(mode=cnet-infer,model=mini,top_k=2,feats_node=conv1,"
              f"feats_max_chans=9,conv_fwd=(engine=ref)),"
              f"(mode=img-sink,out_dir={tmp_path}/f)))")
    bs = read_all_blocks(ds)
    assert len(bs) == 1
    img = bs[0].get_sdb("img")
    assert img is not None and img.nda.v.ndim == 3
    assert img.nda.v.shape[2] == 3        # RGB montage of 9 tiles
    assert bs[0].get_sdb("pred") is not None   # classification still rides
    import pathlib
    assert len(list(pathlib.Path(f"{tmp_path}/f").glob("*.png"))) == 1


def test_scan_max_blocks_finalizes_sinks(tmp_path, capsys):
    """A max_blocks-limited scan never flows an in-band EOF through the
    pipe; sinks must finalize via the stream_eof protocol (pushing an
    empty block instead would PULL a fresh block from the source)."""
    from boda_tpu.core.has_main import create_and_run_has_main
    npy = tmp_path / "o.npy"
    create_and_run_has_main(
        f"(mode=scan_data_stream,max_blocks=2,verbose=0,"
        f"stream=(mode=pipe,stages=((mode=test-gen,num=10,sz=4),"
        f"(mode=npy-sink,fn={npy}))))", global_vars={})
    assert "2 blocks" in capsys.readouterr().out
    assert np.load(npy).shape == (2, 4)  # exactly the scanned blocks


def test_hash_check_truncation_fails(tmp_path):
    """A stream that ends before covering every recorded digest must fail
    verification at end-of-scan, not silently pass with partial coverage."""
    from boda_tpu.core.has_main import create_and_run_has_main
    fn = tmp_path / "h.digests"
    read_all_blocks(spec(f"(mode=pipe,stages=((mode=test-gen,num=5,sz=8),"
                         f"(mode=hash-check,fn={fn},write=1)))"))
    with pytest.raises(RtErr, match="ended after 3 blocks but 5"):
        create_and_run_has_main(
            f"(mode=scan_data_stream,verbose=0,"
            f"stream=(mode=pipe,stages=((mode=test-gen,num=3,sz=8),"
            f"(mode=hash-check,fn={fn}))))", global_vars={})


def test_npy_src_dtype_tns(tmp_path):
    """npy-src maps ALL registered dtypes through dtype_to_tn (float64 /
    int32 stacks used to produce invalid tns that broke digest/bwrite)."""
    from boda_tpu.core.digest import nda_digest
    for dt, tn in ((np.float64, "double"), (np.int32, "int32_t"),
                   (np.uint8, "uint8_t")):
        fn = tmp_path / f"s_{np.dtype(dt).name}.npy"
        np.save(fn, np.arange(6, dtype=dt).reshape(2, 3))
        bs = read_all_blocks(spec(f"(mode=npy-src,fn={fn})"))
        assert len(bs) == 2 and bs[0].nda.dims.tn == tn
        nda_digest(bs[0].nda)  # digestable => tn round-trips
