"""CachingBackend: azfuse download-to-cache semantics (C34).

Routes real gitax IO — TSV reads (mmap via prepare), checkpoint loads,
shard publication + the rank-0 barrier — through a CachingBackend whose
"remote" is a plain directory store, asserting materialize-on-read,
eviction-free cache REUSE (no second fetch), content dedup, and
write-through visibility.
"""

import json
import os
import os.path as op
import shutil

import numpy as np
import pytest

from gitax.io import fileio
from gitax.io.cache_backend import CachingBackend, DirectoryStore
from gitax.io.tsv import TSVFile, _sibling, concat_tsv_files, tsv_writer


@pytest.fixture
def backend(tmp_path):
    store = str(tmp_path / "blobstore")
    cache = str(tmp_path / "cache")
    os.makedirs(store)
    b = CachingBackend(store, cache)
    fileio.set_backend(b)
    yield b
    fileio.set_backend(fileio.LocalBackend())


def _put_tsv_in_store(store_root, rel, rows):
    """Build a TSV (+ indexes) locally, then move it into the store so
    it only exists 'remotely'."""
    tmp = op.join(store_root, "_stage")
    local = op.join(tmp, op.basename(rel))
    tsv_writer(rows, local)
    for src in (local, _sibling(local, ".lineidx"),
                _sibling(local, ".lineidx") + ".8b"):
        dst = op.join(store_root, op.dirname(rel), op.basename(src))
        os.makedirs(op.dirname(dst), exist_ok=True)
        shutil.move(src, dst)
    shutil.rmtree(tmp)


def test_tsv_read_materializes_and_reuses(backend, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rows = [("k{}".format(i), json.dumps([{"caption": "c{}".format(i)}]))
            for i in range(5)]
    _put_tsv_in_store(backend.store.root, "data/img.tsv", rows)
    assert not op.exists(op.join(str(tmp_path), "data/img.tsv"))

    t = TSVFile("data/img.tsv")
    assert len(t) == 5
    assert t[3] == list(rows[3]) or tuple(t[3]) == rows[3]
    n_after_first = backend.fetch_count
    assert n_after_first >= 1

    # eviction-free reuse: a fresh reader re-reads from cache, 0 fetches
    t2 = TSVFile("data/img.tsv")
    assert tuple(t2[0]) == rows[0]
    assert backend.fetch_count == n_after_first

    # invalidate -> next read fetches again
    backend.invalidate("data/img.tsv")
    backend.invalidate("data/img.lineidx.8b")
    backend.invalidate("data/img.lineidx")
    t3 = TSVFile("data/img.tsv")
    assert tuple(t3[4]) == rows[4]
    assert backend.fetch_count > n_after_first


def test_content_dedup_across_paths(backend):
    backend.store.put("a/one.bin", b"same-bytes")
    backend.store.put("b/two.bin", b"same-bytes")
    p1 = fileio.prepare("a/one.bin")
    p2 = fileio.prepare("b/two.bin")
    assert p1 == p2  # content-addressed: one object for both paths
    with fileio.open_file("a/one.bin", "rb") as fp:
        assert fp.read() == b"same-bytes"


def test_checkpoint_load_through_backend(backend, tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    from gitax.ckpt.torch_convert import load_torch_checkpoint

    monkeypatch.chdir(tmp_path)
    sd = {"module.layer.weight": torch.arange(6, dtype=torch.float32).view(2, 3)}
    stage = str(tmp_path / "model.pt")
    torch.save({"model": sd}, stage)
    with open(stage, "rb") as fp:
        backend.store.put("output/M/snapshot/model.pt", fp.read())
    os.remove(stage)

    loaded = load_torch_checkpoint("output/M/snapshot/model.pt")
    assert set(loaded) == {"layer.weight"}  # module. prefix stripped
    np.testing.assert_array_equal(
        loaded["layer.weight"].numpy(),
        np.arange(6, dtype=np.float32).reshape(2, 3),
    )
    n = backend.fetch_count
    load_torch_checkpoint("output/M/snapshot/model.pt")
    assert backend.fetch_count == n  # cached


def test_write_through_and_barrier_visibility(backend, tmp_path, monkeypatch):
    """Shards written on one 'machine' (local dir A) are visible to the
    rank-0 barrier polling on another (local dir B) through the shared
    store — the azfuse upload side."""
    from gitax.runtime.pipeline import wait_and_concat_shards

    a = tmp_path / "machineA"
    b = tmp_path / "machineB"
    a.mkdir(), b.mkdir()
    monkeypatch.chdir(a)
    tsv_writer([("k0", "x")], "out.tsv.0.2.tsv")
    tsv_writer([("k1", "y")], "out.tsv.1.2.tsv")
    # the atomic publication went through replace() -> store holds finals
    assert backend.store.exists("out.tsv.0.2.tsv")
    assert not backend.store.exists("out.tsv.0.2.tsv.tmp")

    monkeypatch.chdir(b)
    assert not op.isfile("out.tsv.0.2.tsv")  # not local here
    wait_and_concat_shards("out.tsv", 2, poll_s=0.05, timeout_s=5)
    t = TSVFile("out.tsv")
    assert [tuple(t[i]) for i in range(2)] == [("k0", "x"), ("k1", "y")]


def test_concat_through_backend(backend, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    tsv_writer([("a", "1"), ("b", "2")], "s0.tsv")
    tsv_writer([("c", "3")], "s1.tsv")
    concat_tsv_files(["s0.tsv", "s1.tsv"], "merged.tsv")
    t = TSVFile("merged.tsv")
    assert [t.get_key(i) for i in range(3)] == ["a", "b", "c"]
    assert backend.store.exists("merged.tsv")


def test_missing_file_raises(backend):
    assert not fileio.isfile("never/written.tsv")
    with pytest.raises(FileNotFoundError):
        fileio.prepare("never/written.tsv")
    with pytest.raises(FileNotFoundError):
        fileio.open_file("never/written.tsv", "rb")


def test_callable_fetch_hook(tmp_path):
    """A bare callable (no DirectoryStore) works as the blob source."""
    calls = []

    def fetch(path):
        calls.append(path)
        return b"payload" if path == "x.bin" else None

    b = CachingBackend(fetch, str(tmp_path / "cache"), write_through=False)
    assert b.isfile("x.bin")
    with b.open("x.bin", "rb") as fp:
        assert fp.read() == b"payload"
    with b.open("x.bin", "rb") as fp:
        fp.read()
    # the isfile probe MATERIALIZES (caches) rather than discarding, so
    # probe + both opens cost exactly one fetch — a barrier polling
    # isfile() against a callable hook must not re-download every cycle
    assert calls.count("x.bin") == 1
    assert not b.isfile("y.bin")


def test_update_modes_never_touch_shared_objects(backend, tmp_path,
                                                 monkeypatch):
    """'r+'/'a' on a remote-only path materialize a PRIVATE local copy;
    the shared content-addressed object stays byte-intact (a writable
    handle on the dedup object would corrupt every aliased path)."""
    monkeypatch.chdir(tmp_path)
    backend.store.put("blob/a.txt", b"hello")
    backend.store.put("blob/b.txt", b"hello")  # same digest as a.txt

    with backend.open("blob/a.txt", "rb+") as fp:
        assert fp.read() == b"hello"
        fp.seek(0)
        fp.write(b"HELLO")
    # a.txt updated locally + written through
    with backend.open("blob/a.txt", "rb") as fp:
        assert fp.read() == b"HELLO"
    # the alias still serves the ORIGINAL content
    backend.invalidate("blob/b.txt")
    with backend.open("blob/b.txt", "rb") as fp:
        assert fp.read() == b"hello"

    # append mode preserves remote content instead of starting empty
    backend.store.put("blob/log.txt", b"line1\n")
    with backend.open("blob/log.txt", "ab") as fp:
        fp.write(b"line2\n")
    with backend.open("blob/log.txt", "rb") as fp:
        assert fp.read() == b"line1\nline2\n"

    # 'r+' on a path that exists nowhere still raises
    with pytest.raises(FileNotFoundError):
        backend.open("blob/missing.txt", "rb+")


def test_readonly_update_handle_does_not_republish(backend, tmp_path,
                                                   monkeypatch):
    """A 'r+' handle that never writes must NOT push its bytes back to
    the store on close: a concurrent rank's update would be silently
    reverted by the stale re-publication (lost update)."""
    monkeypatch.chdir(tmp_path)
    backend.store.put("blob/cfg.txt", b"v1")
    with backend.open("blob/cfg.txt", "rb+") as fp:
        assert fp.read() == b"v1"
        # another rank updates the store while our handle is open
        backend.store.put("blob/cfg.txt", b"v2")
    assert backend.store.fetch("blob/cfg.txt") == b"v2"  # not reverted

    # a handle that DOES write still publishes
    with backend.open("blob/cfg.txt", "rb+") as fp:
        fp.write(b"v3")
    assert backend.store.fetch("blob/cfg.txt") == b"v3"


def test_pointer_refreshed_after_update(backend, tmp_path, monkeypatch):
    """After an update through the backend, losing the local copy must
    re-materialize the NEW content: the path->object pointer is
    refreshed at publish time (it previously named the pre-update
    object)."""
    monkeypatch.chdir(tmp_path)
    backend.store.put("blob/state.bin", b"old")
    with backend.open("blob/state.bin", "rb") as fp:  # caches pointer
        assert fp.read() == b"old"
    with backend.open("blob/state.bin", "ab") as fp:
        fp.write(b"+new")
    os.remove(op.join(str(tmp_path), "blob", "state.bin"))  # lose local
    with backend.open("blob/state.bin", "rb") as fp:
        assert fp.read() == b"old+new"
