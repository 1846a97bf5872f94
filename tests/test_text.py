import numpy as np
import pyarrow as pa

from kmcp_ray import text
from kmcp_ray.config import DedupConfig

from tests import oracle

CFG = DedupConfig()


def _engine_sketch(caption):
    ss = text.shingle_sets(pa.array([caption]), CFG.shingle_k, CFG.max_hash)
    return ss


def test_shingle_sets_match_oracle():
    caps = ["the quick brown fox jumps over the lazy dog",
            "one two", "", "   ", "x", "a b c a b c a b c",
            "Hello, World! hello world", None]
    ss = text.shingle_sets(pa.array(caps, pa.string()), CFG.shingle_k, CFG.max_hash)
    for i, cap in enumerate(caps):
        got = ss["hashes"][ss["offsets"][i]:ss["offsets"][i + 1]]
        want = oracle.sketch_of(cap or "", CFG)
        assert got.tolist() == want.tolist(), f"row {i}: {cap!r}"
        assert ss["n_tokens"][i] == len(oracle.tokens_of(cap or ""))


def test_minhash_and_bands_match_oracle():
    caps = ["the quick brown fox jumps over the lazy dog and more words here",
            "completely different caption with other content entirely now",
            ""]
    ss = text.shingle_sets(pa.array(caps), CFG.shingle_k, CFG.max_hash)
    sig = text.minhash_signatures(ss["hashes"], ss["offsets"], CFG.num_perm)
    keys = text.band_keys(sig, CFG.bands)
    for i, cap in enumerate(caps):
        osk = oracle.sketch_of(cap, CFG)
        osig = oracle.minhash_of(osk, CFG)
        assert sig[i].tolist() == osig.tolist(), f"row {i}"
        okeys = oracle.band_keys_of(osig, CFG)
        if not okeys:
            assert (keys[i] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
        else:
            assert keys[i].tolist() == okeys


def test_identical_texts_identical_signatures():
    caps = ["same same same words in here repeated"] * 2
    ss = text.shingle_sets(pa.array(caps), CFG.shingle_k, CFG.max_hash)
    sig = text.minhash_signatures(ss["hashes"], ss["offsets"], CFG.num_perm)
    assert sig[0].tolist() == sig[1].tolist()


def test_minhash_jaccard_estimate_reasonable():
    a = "w" + " w".join(str(i) for i in range(100))
    b = "w" + " w".join(str(i) for i in range(80))  # ~80% containment
    ss = text.shingle_sets(pa.array([a, b]), CFG.shingle_k, CFG.max_hash)
    sig = text.minhash_signatures(ss["hashes"], ss["offsets"], CFG.num_perm)
    est = (sig[0] == sig[1]).mean()
    sa = ss["hashes"][ss["offsets"][0]:ss["offsets"][1]]
    sb = ss["hashes"][ss["offsets"][1]:ss["offsets"][2]]
    c = np.intersect1d(sa, sb).size
    true_j = c / (len(sa) + len(sb) - c)
    assert abs(est - true_j) < 0.15
