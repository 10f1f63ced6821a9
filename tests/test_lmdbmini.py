"""LMDB layer tests: pure-Python format reader/writer (utils/lmdbmini.py)
+ the datum stream / accuracy-eval / bench / display modes over a real
generated fixture (reference: lmdbif.cc, lmdb_caffe_io.cc)."""

import numpy as np
import pytest

from boda_tpu.apps.eval_cls import encode_datum, open_lmdb_kv_iter
from boda_tpu.core.has_main import create_and_run_has_main
from boda_tpu.utils.lmdbmini import LmdbMini, NODEMAX, write_lmdb


def run_mode(s):
    return create_and_run_has_main(s, global_vars={})


class TestFormatRoundTrip:
    def test_small(self, tmp_path):
        kvs = [(b"k%03d" % i, b"val%d" % i) for i in range(20)]
        st = write_lmdb(tmp_path / "env", kvs)
        assert st["entries"] == 20 and st["depth"] == 1
        env = LmdbMini(tmp_path / "env")
        assert list(env.items()) == sorted(kvs)
        assert env.get(b"k011") == b"val11"
        assert env.get(b"absent") is None

    def test_multilevel_tree_and_overflow(self, tmp_path):
        """3000 mixed-size values force depth >= 2 branches and F_BIGDATA
        overflow chains (values above the in-leaf node max)."""
        rng = np.random.RandomState(0)
        kvs = [(b"key%06d" % i, rng.bytes(30 + (i % 7) * 900))
               for i in range(3000)]
        assert any(len(v) > NODEMAX for _k, v in kvs)
        write_lmdb(tmp_path / "env", kvs)
        env = LmdbMini(tmp_path / "env")
        assert env.stat()["depth"] >= 2
        assert list(env.items()) == sorted(kvs)
        d = dict(kvs)
        for i in (0, 1, 1499, 2998, 2999):
            assert env.get(b"key%06d" % i) == d[b"key%06d" % i]

    def test_empty_env(self, tmp_path):
        write_lmdb(tmp_path / "env", [])
        env = LmdbMini(tmp_path / "env")
        assert list(env.items()) == []
        assert env.get(b"x") is None
        assert env.stat()["entries"] == 0

    def test_duplicate_keys_rejected(self, tmp_path):
        with pytest.raises(Exception, match="duplicate"):
            write_lmdb(tmp_path / "env", [(b"a", b"1"), (b"a", b"2")])

    def test_newest_meta_wins(self, tmp_path):
        """Reader must pick the meta page with the larger txnid (the
        writer leaves meta0 at txn 0 pointing at an empty root)."""
        write_lmdb(tmp_path / "env", [(b"k", b"v")])
        env = LmdbMini(tmp_path / "env")
        assert env.meta["txnid"] == 1
        assert env.get(b"k") == b"v"

    def test_real_lmdb_module_interop(self, tmp_path):
        """When the real lmdb module is present, it must read our files
        (format conformance beyond self-round-trip)."""
        lmdb = pytest.importorskip("lmdb")
        kvs = [(b"k%04d" % i, b"x" * (i % 100)) for i in range(500)]
        write_lmdb(tmp_path / "env", kvs)
        with lmdb.open(str(tmp_path / "env"), readonly=True, lock=False) as e:
            with e.begin() as txn:
                got = list(iter(txn.cursor()))
        assert got == sorted(kvs)


class TestDatumStream:
    def test_open_kv_iter_and_datum_decode(self, tmp_path):
        img = np.arange(3 * 4 * 5, dtype=np.uint8).reshape(3, 4, 5)
        write_lmdb(tmp_path / "env", [(b"00000000", encode_datum(img, 7))])
        from boda_tpu.graph.pbwire import decode_wire
        (_k, raw), = list(open_lmdb_kv_iter(str(tmp_path / "env")))
        d = decode_wire(raw)
        assert (d.varint(1), d.varint(2), d.varint(3)) == (3, 4, 5)
        assert d.varint(5) == 7
        got = np.frombuffer(d.bytes_field(4), np.uint8).reshape(3, 4, 5)
        np.testing.assert_array_equal(got, img)

    def test_lmdb_src_stream(self, tmp_path, capsys):
        run_mode(f"(mode=gen_lmdb,out_dir={tmp_path}/env,num_imgs=6,"
                 f"ysz=16,xsz=16,num_classes=3)")
        capsys.readouterr()
        from boda_tpu.io.data_stream import DataBlock, make_data_stream
        src = make_data_stream({"mode": "lmdb-src", "fn": f"{tmp_path}/env",
                                "mean": "128"})
        blocks = []
        while True:
            b = src.proc_block(DataBlock())
            if not b.valid():
                break
            blocks.append(b)
        assert len(blocks) == 6
        assert blocks[0].nda.v.shape == (3, 16, 16)
        labels = [int(b.get_sdb("label").nda.v[0]) for b in blocks]
        assert labels == [0, 1, 2, 0, 1, 2]
        # mean got subtracted
        assert blocks[0].nda.v.min() >= -128.0


class TestLmdbModes:
    @pytest.fixture()
    def env(self, tmp_path, capsys):
        run_mode(f"(mode=gen_lmdb,out_dir={tmp_path}/env,num_imgs=8,"
                 f"num_classes=10)")
        capsys.readouterr()
        return f"{tmp_path}/env"

    def test_lmdb_bench(self, env, capsys):
        run_mode(f"(mode=lmdb_bench,fn={env})")
        out = capsys.readouterr().out
        assert "entries=8" in out
        assert "(3, 32, 32)" in out

    def test_display_lmdb(self, env, tmp_path, capsys):
        run_mode(f"(mode=display_lmdb,fn={env},num_imgs=4,"
                 f"boda_output_dir={tmp_path},out_fn=m.png)")
        assert "wrote 4 datums" in capsys.readouterr().out
        assert (tmp_path / "m.png").stat().st_size > 0

    def test_test_lmdb_accuracy_eval(self, env, capsys):
        run_mode(f"(mode=test_lmdb,model=mini,"
                 f"in_dims=(dims=(img=4,chan=3,y=32,x=32)),"
                 f"src=(mode=lmdb-src,fn={env},mean=128))")
        out = capsys.readouterr().out
        assert "top_1_acc=" in out and "num_test=8" in out
