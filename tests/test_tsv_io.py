import os

import numpy as np
import pytest

from gitax.io.tsv import TSVFile, concat_tsv_files, tsv_reader, tsv_writer


def write_rows(path, rows):
    tsv_writer(rows, str(path))


def test_round_trip(tmp_path):
    p = tmp_path / "data.tsv"
    rows = [["key{}".format(i), "value{}".format(i)] for i in range(10)]
    write_rows(p, rows)
    t = TSVFile(str(p))
    assert len(t) == 10
    assert t[0] == ["key0", "value0"]
    assert t[9] == ["key9", "value9"]
    assert t.get_key(5) == "key5"
    assert list(t) == rows


def test_lineidx_files_written(tmp_path):
    p = tmp_path / "data.tsv"
    write_rows(p, [["a", "1"], ["bb", "22"]])
    lineidx = tmp_path / "data.lineidx"
    lineidx8b = tmp_path / "data.lineidx.8b"
    assert lineidx.exists() and lineidx8b.exists()
    # ascii offsets match binary offsets
    ascii_offsets = [int(x) for x in lineidx.read_text().split()]
    bin_offsets = np.fromfile(str(lineidx8b), dtype="<i8").tolist()
    assert ascii_offsets == bin_offsets == [0, 4]


def test_reads_legacy_lineidx_only(tmp_path):
    """Reference datasets sometimes ship only .lineidx (tsv_io.py:296-310)."""
    p = tmp_path / "data.tsv"
    write_rows(p, [["k0", "v0"], ["k1", "v1"]])
    os.remove(str(tmp_path / "data.lineidx.8b"))
    t = TSVFile(str(p))
    assert len(t) == 2
    assert t[1] == ["k1", "v1"]


def test_bytes_payload(tmp_path):
    p = tmp_path / "data.tsv"
    write_rows(p, [["k", b"raw-bytes-payload"]])
    t = TSVFile(str(p))
    assert t[0] == ["k", "raw-bytes-payload"]


def test_concat_with_offset_rebase(tmp_path):
    a, b, out = tmp_path / "a.tsv", tmp_path / "b.tsv", tmp_path / "out.tsv"
    write_rows(a, [["a0", "x"], ["a1", "y"]])
    write_rows(b, [["b0", "z"]])
    concat_tsv_files([str(a), str(b)], str(out))
    t = TSVFile(str(out))
    assert len(t) == 3
    assert [t.get_key(i) for i in range(3)] == ["a0", "a1", "b0"]
    assert t[2] == ["b0", "z"]


def test_tsv_reader(tmp_path):
    p = tmp_path / "data.tsv"
    write_rows(p, [["k", "v"], ["k2", "v2"]])
    assert list(tsv_reader(str(p))) == [["k", "v"], ["k2", "v2"]]


def test_fork_safety(tmp_path):
    p = tmp_path / "data.tsv"
    write_rows(p, [["k{}".format(i), "v"] for i in range(5)])
    t = TSVFile(str(p))
    assert t[0][0] == "k0"
    pid = os.fork()
    if pid == 0:  # child
        ok = t[3][0] == "k3"
        os._exit(0 if ok else 1)
    _, status = os.waitpid(pid, 0)
    assert os.waitstatus_to_exitcode(status) == 0
    assert t[4][0] == "k4"


def test_writer_is_atomic(tmp_path):
    """The data file must appear only after its offset indices exist and
    all writes are complete (shard-barrier safety), and no *.tmp
    intermediates may be left behind."""
    p = tmp_path / "atomic.tsv"

    def rows():
        # while the writer is mid-stream, the final path must not exist
        yield ["k0", "v0"]
        assert not p.exists()
        assert (tmp_path / "atomic.tsv.tmp").exists()
        yield ["k1", "v1"]

    tsv_writer(rows(), str(p))
    assert p.exists()
    assert (tmp_path / "atomic.lineidx").exists()
    assert (tmp_path / "atomic.lineidx.8b").exists()
    assert not list(tmp_path.glob("*.tmp"))
    t = TSVFile(str(p))
    assert [t.get_key(i) for i in range(2)] == ["k0", "k1"]


def test_fileio_backend_seam(tmp_path, monkeypatch):
    """Installing a custom file backend reroutes TSV IO (the azfuse-style
    seam, gitax.io.fileio) — here a counting wrapper over local files."""
    from gitax.io import fileio

    calls = {"open": 0, "prepare": 0}

    class Counting(fileio.LocalBackend):
        def open(self, path, mode="r"):
            calls["open"] += 1
            return fileio.LocalBackend.open(path, mode)

        def prepare(self, path):
            calls["prepare"] += 1
            return path

    orig = fileio.get_backend()
    fileio.set_backend(Counting())
    try:
        p = tmp_path / "seam.tsv"
        write_rows(p, [["k0", "v0"], ["k1", "v1"]])
        t = TSVFile(str(p))
        assert [t.get_key(i) for i in range(2)] == ["k0", "k1"]
    finally:
        fileio.set_backend(orig)
    assert calls["open"] >= 3  # three .tmp files at minimum
    assert calls["prepare"] >= 2  # data + lineidx.8b mmaps


def test_concat_tsv_files_is_atomic(tmp_path, monkeypatch):
    """concat publishes the offset tables BEFORE the data file and only
    via renames — a barrier polling for the data file must never see it
    half-written or paired with stale indices."""
    import gitax.io.fileio as fileio
    from gitax.io.tsv import TSVFile, concat_tsv_files, tsv_writer

    a, b_, out = (str(tmp_path / n) for n in ("a.tsv", "b.tsv", "out.tsv"))
    tsv_writer([("k0", "v0"), ("k1", "v1")], a)
    tsv_writer([("k2", "v2")], b_)
    # stale artifacts from a "previous run" at the output path
    tsv_writer([("old", "old")], out)

    events = []
    orig_replace = fileio.replace

    def spy_replace(src, dst):
        events.append(dst)
        return orig_replace(src, dst)

    removed = []
    orig_remove = fileio.remove

    def spy_remove(path):
        removed.append(path)
        return orig_remove(path)

    monkeypatch.setattr(fileio, "replace", spy_replace)
    monkeypatch.setattr(fileio, "remove", spy_remove)
    concat_tsv_files([a, b_], out)
    # the stale data file is removed BEFORE anything is published (with
    # it present, a poller could pair old data with new offsets)
    assert removed == [out]
    # data file rename is LAST (it is the barrier signal)
    assert events[-1] == out
    base = out[: -len(".tsv")]
    assert set(events) == {out, base + ".lineidx", base + ".lineidx.8b"}
    t = TSVFile(out)
    assert [t[i] for i in range(3)] == [
        ["k0", "v0"], ["k1", "v1"], ["k2", "v2"]
    ]
