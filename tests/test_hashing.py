import numpy as np

from kmcp_ray import hashing
from kmcp_ray.hashing import U64


def test_splitmix64_deterministic_and_scalar_vector_agree():
    xs = np.array([0, 1, 2, 2**63, 2**64 - 1], dtype=np.uint64)
    v = hashing.splitmix64(xs)
    for i, x in enumerate(xs):
        assert hashing.splitmix64(x) == v[i]
    # two calls identical
    assert (hashing.splitmix64(xs) == v).all()
    # avalanche sanity: consecutive inputs map far apart
    assert len(np.unique(v)) == len(v)


def test_popcount64():
    xs = np.array([0, 1, 3, 0xFF, 2**64 - 1, 0x8000000000000001], dtype=np.uint64)
    expect = [bin(int(x)).count("1") for x in xs]
    assert hashing.popcount64(xs).tolist() == expect


def test_hash_tokens_str_and_bytes_deterministic():
    a = hashing.hash_tokens(np.array(["foo", "bar", "foo"], dtype=object))
    assert a.dtype == np.uint64
    assert a[0] == a[2] and a[0] != a[1]
    b = hashing.hash_strings([b"\x00\x01", b"\x00\x01", b"\x00\x02"])
    assert b[0] == b[1] and b[0] != b[2]


def test_fold_rows_matches_fold():
    rng = np.random.default_rng(0)
    mat = rng.integers(0, 2**63, (5, 4)).astype(np.uint64)
    fr = hashing.fold_rows(mat)
    for i in range(5):
        assert fr[i] == hashing.fold(mat[i])


def test_combine3_order_sensitive():
    a, b, c = U64(1), U64(2), U64(3)
    assert hashing.combine3(a, b, c) != hashing.combine3(b, a, c)
