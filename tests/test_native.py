"""Native C++ host-runtime kernels (with automatic Python fallback)."""

import numpy as np
import pytest

from lotus_tpu import native


def test_union_find_components():
    # 0-1-2 form one component, 3-4 another, 5 isolated.
    edges = np.array([[0, 1], [1, 2], [3, 4]], dtype=np.int64)
    labels = native.union_find(edges, 6)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[0] != labels[3]
    assert labels[5] not in (labels[0], labels[3])


def test_union_find_large_chain():
    n = 10_000
    edges = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1).astype(np.int64)
    labels = native.union_find(edges, n)
    assert len(set(labels.tolist())) == 1


def test_topk_merge():
    scores = np.array([[9.0, 5.0, 1.0], [8.0, 7.0, 6.0]], dtype=np.float32)
    ids = np.array([[10, 11, 12], [20, 21, 22]], dtype=np.int64)
    s, i = native.topk_merge(scores, ids, 4)
    assert i.tolist() == [10, 20, 21, 22]
    assert s.tolist() == [9.0, 8.0, 7.0, 6.0]


def test_topk_merge_with_missing():
    scores = np.array([[9.0, 0.0], [8.0, 7.0]], dtype=np.float32)
    ids = np.array([[10, -1], [20, 21]], dtype=np.int64)
    s, i = native.topk_merge(scores, ids, 5)
    assert i.tolist()[:3] == [10, 20, 21]
    assert i.tolist()[3:] == [-1, -1]


def test_checksummed_array_roundtrip(tmp_path):
    arr = np.random.default_rng(0).standard_normal((37, 5)).astype(np.float32)
    path = str(tmp_path / "arr.ltpu")
    native.write_array(path, arr)
    back = native.read_array(path, np.float32, (37, 5))
    np.testing.assert_array_equal(arr, back)


def test_checksummed_array_detects_corruption(tmp_path):
    arr = np.arange(100, dtype=np.float32)
    path = str(tmp_path / "arr.ltpu")
    native.write_array(path, arr)
    with open(path, "r+b") as f:
        f.seek(30)
        f.write(b"\xff\xff")
    with pytest.raises(OSError, match="checksum|corrupt"):
        native.read_array(path, np.float32, (100,))


def test_native_library_builds():
    # The C++ library should actually be in play in this environment.
    assert native.available()
