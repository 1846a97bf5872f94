"""64-bit hash primitives — the frozen, bit-reproducible contract.

Every stage (engine and oracle alike) derives shingle hashes, MinHash
permutations, band keys and bucket partitions from the functions in this
module, mirroring how kmcp derives everything from one ntHash value per
k-mer plus a Thomas-Wang style integer mix (reference:
kmcp/cmd/util-hash.go:61-155).  All functions are vectorized numpy over
``uint64`` with wrap-around arithmetic; scalars work too.

numpy 1.26 note: python-int constants that fit in uint64 combine with
uint64 arrays without up-casting, but we wrap every constant in
``np.uint64`` anyway to be explicit and future-proof.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

U64 = np.uint64
MAX_U64 = U64(0xFFFFFFFFFFFFFFFF)

_SM_C1 = U64(0x9E3779B97F4A7C15)
_SM_C2 = U64(0xBF58476D1CE4E5B9)
_SM_C3 = U64(0x94D049BB133111EB)

# order-sensitive shingle-combination multipliers (distinct odd constants)
_MIX_A = U64(0xC2B2AE3D27D4EB4F)   # xxhash64 prime 2
_MIX_B = U64(0x165667B19E3779F9)   # xxhash64 prime 5-ish
_MIX_C = U64(0x27D4EB2F165667C5)

#: seed used to derive the MinHash permutation family
_PERM_SEED = U64(0x5851F42D4C957F2D)
#: seed used to derive per-band mixing constants
_BAND_SEED = U64(0x2545F4914F6CDD1D)


def splitmix64(x):
    """splitmix64 finalizer (public domain constant set).

    Good avalanche; stands in for kmcp's Thomas-Wang ``hash64``
    (reference: kmcp/cmd/util-hash.go:146-155) — re-implemented from the
    published splitmix64 algorithm, not translated from the reference.
    """
    with np.errstate(over="ignore"):          # uint64 wraparound is intended
        z = np.asarray(x, dtype=np.uint64) + _SM_C1
        z = (z ^ (z >> U64(30))) * _SM_C2
        z = (z ^ (z >> U64(27))) * _SM_C3
        return z ^ (z >> U64(31))


def hash_tokens(tokens: np.ndarray) -> np.ndarray:
    """Hash an object-dtype array of token strings to uint64.

    Uses pandas' SipHash-1-3 string hashing with its fixed default key —
    deterministic across processes and machines, implemented in C.
    """
    if len(tokens) == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(tokens, dtype=object)).astype(np.uint64)


def combine3(a, b, c):
    """Order-sensitive combination of three uint64s into one."""
    a = np.asarray(a, dtype=np.uint64)
    return splitmix64(a * _MIX_A + np.asarray(b, dtype=np.uint64) * _MIX_B
                      + np.asarray(c, dtype=np.uint64) * _MIX_C)


def fold(values: np.ndarray) -> np.uint64:
    """Order-sensitive fold of a 1-D uint64 array into one value
    (used for whole-signature identity in the salted-bucket path)."""
    with np.errstate(over="ignore"):          # uint64 wraparound is intended
        h = U64(len(values)) * _MIX_A
        for v in np.asarray(values, dtype=np.uint64):
            h = splitmix64(h + v * _MIX_B)
        return h


def fold_rows(mat: np.ndarray) -> np.ndarray:
    """Vectorized :func:`fold` over the rows of a 2-D uint64 array."""
    mat = np.asarray(mat, dtype=np.uint64)
    h = np.full(mat.shape[0], U64(mat.shape[1]) * _MIX_A, dtype=np.uint64)
    for j in range(mat.shape[1]):
        h = splitmix64(h + mat[:, j] * _MIX_B)
    return h


def perm_seeds(num_perm: int) -> np.ndarray:
    """The MinHash permutation family: perm_i(x) = splitmix64(x ^ seed_i)."""
    return splitmix64(np.arange(num_perm, dtype=np.uint64) + _PERM_SEED)


def band_consts(bands: int) -> np.ndarray:
    return splitmix64(np.arange(bands, dtype=np.uint64) + _BAND_SEED)


def popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount for uint64 arrays (numpy 1.26 has no bitwise_count)."""
    x = np.asarray(x, dtype=np.uint64)
    m1 = U64(0x5555555555555555)
    m2 = U64(0x3333333333333333)
    m4 = U64(0x0F0F0F0F0F0F0F0F)
    h01 = U64(0x0101010101010101)
    with np.errstate(over="ignore"):          # uint64 wraparound is intended
        x = x - ((x >> U64(1)) & m1)
        x = (x & m2) + ((x >> U64(2)) & m2)
        x = (x + (x >> U64(4))) & m4
        return (x * h01) >> U64(56)


def md5_lower64(strings) -> np.ndarray:
    """uint64 hash of each string: the FIRST 8 bytes of its md5 digest,
    big-endian — bit-identical to DuckDB's
    ``('0x' || substr(md5(s), 1, 16))::UBIGINT``.

    This is the SQL-mirrorable hash variant used ONLY by the
    driver-oracled query entries (simhash/fingerprint); the production
    default stays the vectorized SipHash path.  Hashing runs once per
    DISTINCT string (md5 is a Python-loop hash — fine at oracle scale,
    wrong for the 10^12-row hot path)."""
    import hashlib
    arr = np.asarray(strings, dtype=object)
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    uniq, inv = np.unique(arr, return_inverse=True)
    hv = np.fromiter(
        (int.from_bytes(hashlib.md5(
            s if isinstance(s, bytes) else s.encode("utf-8"))
            .digest()[:8], "big")
         for s in uniq), dtype=np.uint64, count=len(uniq))
    return hv[inv]


def hash_strings(strings) -> np.ndarray:
    """uint64 content hash of whole strings (exact-dup keys).

    Accepts a sequence / object array of ``str`` or ``bytes``.
    """
    arr = np.asarray(strings, dtype=object)
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr).astype(np.uint64)
