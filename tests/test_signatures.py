"""Signature math: determinism, sensitivity, invariance (golden-ish).

Mirrors the reference's TestSimilarImageDetection strategy
(/root/reference/tests/test_core.py:1696-1760): seeded synthetic
inputs, low distance for perturbed copies, high for different content.
"""

import numpy as np
import pytest

from photo_dedup_spark.config import DedupConfig
from photo_dedup_spark.functions.normalize import normalize_py
from photo_dedup_spark.functions.signatures import (
    band_hashes_py,
    containment_py,
    hamming_py,
    jaccard_py,
    minhash_py,
    popcount64,
    shingle_hashes,
    simhash_py,
)

CFG = DedupConfig()


def _mk_text(seed: int, n: int = 300) -> str:
    rng = np.random.RandomState(seed)
    stems = "alpha beta gamma delta eps zeta eta theta iota kappa".split()
    return " ".join(
        f"{stems[i]}{j}" for i, j in zip(rng.randint(0, 10, n), rng.randint(0, 500, n))
    )


class TestShingles:
    def test_deterministic(self):
        t = _mk_text(1)
        assert (shingle_hashes(t, 7) == shingle_hashes(t, 7)).all()

    def test_short_text_still_signed(self):
        # degrade-don't-drop: texts shorter than k get one hash
        assert shingle_hashes("ab", 7).size == 1
        assert shingle_hashes("", 7).size == 0

    def test_distinct_texts_distinct_sets(self):
        a = shingle_hashes(_mk_text(1), 7)
        b = shingle_hashes(_mk_text(2), 7)
        inter = np.intersect1d(a, b).size
        assert inter / min(a.size, b.size) < 0.9


class TestMinHash:
    def test_estimates_jaccard(self):
        base = _mk_text(3, 400)
        near = base[:1200] + " xx " + base[1200:]
        true_j = jaccard_py(base, near, CFG)
        est = float((minhash_py(base, CFG) == minhash_py(near, CFG)).mean())
        assert abs(true_j - est) < 0.15
        assert true_j > 0.9

    def test_selfsim_is_one(self):
        t = _mk_text(4)
        assert (minhash_py(t, CFG) == minhash_py(t, CFG)).all()
        assert jaccard_py(t, t, CFG) == 1.0

    def test_signature_shape_and_range(self):
        sig = minhash_py(_mk_text(5), CFG)
        assert sig.shape == (CFG.minhash_perms,)
        assert sig.dtype == np.int32
        assert (sig >= 0).all()  # top-31-bit extraction keeps int32 positive

    def test_band_count(self):
        bands = band_hashes_py(minhash_py(_mk_text(6), CFG), CFG)
        assert bands.shape == (CFG.lsh_bands,)


class TestSimHash:
    def test_near_duplicate_low_hamming(self):
        # analog of test_core.py:1713-1728 (resized image, low distance)
        base = _mk_text(7, 500)
        near = base[:900] + " inserted comment " + base[900:]
        assert hamming_py(simhash_py(base, CFG), simhash_py(near, CFG)) <= CFG.hamming_threshold

    def test_different_content_high_hamming(self):
        # analog of test_core.py:1730-1742 (different content, high distance)
        a, b = _mk_text(8, 500), _mk_text(9, 500)
        assert hamming_py(simhash_py(a, CFG), simhash_py(b, CFG)) > CFG.hamming_threshold

    def test_word_count(self):
        assert simhash_py(_mk_text(10), CFG).shape == (CFG.simhash_words,)


class TestContainment:
    def test_truncation_detected(self):
        base = _mk_text(11, 600)
        trunc = base[: int(len(base) * 0.75)]
        assert containment_py(trunc, base, CFG) > 0.95
        assert jaccard_py(trunc, base, CFG) < 0.85

    def test_unrelated_low(self):
        assert containment_py(_mk_text(12), _mk_text(13), CFG) < 0.5


class TestNormalization:
    def test_crlf_and_trailing_ws_collapse(self):
        a = "def f():\n    return 1\n"
        b = "def f():  \r\n    return 1  \r\n\r\n  "
        assert normalize_py(a) == normalize_py(b)

    def test_interior_ws_preserved(self):
        assert normalize_py("a  b\nc") == "a  b\nc"


class TestPopcount:
    @pytest.mark.parametrize("v,expect", [(0, 0), (1, 1), (0xFF, 8), (2**63, 1)])
    def test_values(self, v, expect):
        assert popcount64(np.array([v], dtype=np.uint64))[0] == expect
