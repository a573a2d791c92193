"""Index persistence format: manifest versioning, mmap reads, shard files."""

import numpy as np
import pytest

from lotus_tpu.ops import io as index_io


def test_meta_roundtrip_stamps_version(tmp_path):
    d = str(tmp_path / "ix")
    index_io.write_meta(d, {"kind": "flat", "metric": "ip", "n_rows": 3})
    meta = index_io.read_meta(d)
    assert meta["format_version"] == index_io.FORMAT_VERSION
    assert meta["kind"] == "flat" and meta["n_rows"] == 3


def test_meta_missing_and_future_version(tmp_path):
    with pytest.raises(FileNotFoundError):
        index_io.read_meta(str(tmp_path / "nowhere"))
    d = str(tmp_path / "future")
    index_io.write_meta(d, {"kind": "flat"})
    import json
    import os

    path = os.path.join(d, index_io.META_FILE)
    meta = json.load(open(path))
    meta["format_version"] = index_io.FORMAT_VERSION + 1
    json.dump(meta, open(path, "w"))
    with pytest.raises(ValueError, match="format_version"):
        index_io.read_meta(d)


def test_array_roundtrip_mmap_and_eager(tmp_path):
    d = str(tmp_path / "ix")
    arr = np.arange(24, dtype=np.float32).reshape(6, 4)
    index_io.write_array(d, "vectors", arr)
    assert index_io.array_exists(d, "vectors")
    assert not index_io.array_exists(d, "other")
    mm = index_io.read_array(d, "vectors")  # mmap by default
    assert isinstance(mm, np.memmap)
    np.testing.assert_array_equal(np.asarray(mm), arr)
    eager = index_io.read_array(d, "vectors", mmap=False)
    assert not isinstance(eager, np.memmap)
    np.testing.assert_array_equal(eager, arr)


def test_shard_manifest_detection(tmp_path):
    from lotus_tpu.parallel.distributed import load_index_shard, save_index_shards, shard_manifest

    d = str(tmp_path / "ix")
    index_io.write_meta(d, {"kind": "ivf"})
    assert not index_io.has_shard_manifest(d)
    for sid in range(2):
        save_index_shards(
            d, {"vecs": np.full((4, 3), sid, np.float32)}, shard_id=sid, num_shards=2,
            meta={"note": "t"},
        )
    assert index_io.has_shard_manifest(d)
    manifest = shard_manifest(d)
    assert int(manifest["num_shards"]) == 2 and manifest["meta"]["note"] == "t"
    back = load_index_shard(d, 1)
    np.testing.assert_array_equal(back["vecs"], np.ones((4, 3), np.float32))
