"""Host-setup cache (utils/setup_cache.py) + picklable Dim0Transform.

The setup cache persists assembled + preconditioned operator stacks so a
fresh process loads them at disk speed instead of re-running the 7-75 s
host assembly+congruence (round-2 VERDICT top item).  Key properties:
hit returns the identical value, code edits invalidate (source-hashed
keys), corrupt entries rebuild, and the preconditioning transform —
previously closure-based — pickles and reproduces exactly.
"""

import os
import pickle

import numpy as np
import pytest

from pgdrome_tpu.models.problems import parametric_elliptic
from pgdrome_tpu.separated import precondition_dim0
from pgdrome_tpu.utils.setup_cache import cached_setup


@pytest.fixture()
def small_problem():
    return parametric_elliptic(n_x=48, n_p=12, num_params=2)


class TestDim0TransformPickle:
    def test_banded_roundtrip(self, small_problem):
        sep, Vs = small_problem
        sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
        assert tf.banded is not None  # P2 interval: banded path
        tf2 = pickle.loads(pickle.dumps(tf, protocol=5))
        y = np.random.default_rng(0).normal(size=(3, sep_pc.sizes[0]))
        np.testing.assert_array_equal(
            tf.modes_to_full(y), tf2.modes_to_full(y)
        )

    def test_dense_roundtrip(self):
        # force the dense fallback with a tiny space (banded needs
        # (bw+1)*8 <= n)
        sep, Vs = parametric_elliptic(n_x=8, n_p=6, num_params=1)
        sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
        assert tf.dense_L is not None
        tf2 = pickle.loads(pickle.dumps(tf, protocol=5))
        y = np.random.default_rng(1).normal(size=(2, sep_pc.sizes[0]))
        np.testing.assert_array_equal(
            tf.modes_to_full(y), tf2.modes_to_full(y)
        )

    def test_apply_linv_inverts_cholesky(self, small_problem):
        # L^{-1} K0 L^{-T} == I on the interior (the congruence identity)
        sep, Vs = small_problem
        sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
        np.testing.assert_allclose(
            np.asarray(sep_pc.ops[0][0]), np.eye(sep_pc.sizes[0]),
            atol=1e-10,
        )


class TestCachedSetup:
    def test_off_without_dir(self, small_problem, monkeypatch):
        monkeypatch.delenv("PGDROME_SETUP_CACHE", raising=False)
        calls = []
        value, status = cached_setup(lambda: calls.append(1) or 42, ["k"])
        assert (value, status) == (42, "off")

    def test_miss_then_hit(self, tmp_path, small_problem):
        sep, Vs = small_problem
        sep_pc, tf = precondition_dim0(sep, dtype=np.float64)
        calls = []

        def build():
            calls.append(1)
            return sep_pc, tf, {"sizes": tuple(sep.sizes)}

        key = ["t", 48, 12, 2]
        v1, s1 = cached_setup(build, key, cache_dir=str(tmp_path))
        assert s1 == "miss" and len(calls) == 1
        v2, s2 = cached_setup(build, key, cache_dir=str(tmp_path))
        assert s2 == "hit" and len(calls) == 1  # not rebuilt
        pc2, tf2, meta2 = v2
        np.testing.assert_array_equal(
            np.asarray(pc2.ops[0]), np.asarray(sep_pc.ops[0])
        )
        np.testing.assert_array_equal(
            np.asarray(pc2.bc_masks[0]), np.asarray(sep_pc.bc_masks[0])
        )
        y = np.random.default_rng(3).normal(size=(2, sep_pc.sizes[0]))
        np.testing.assert_array_equal(
            tf2.modes_to_full(y), tf.modes_to_full(y)
        )
        assert meta2 == {"sizes": tuple(sep.sizes)}

    def test_key_data_invalidates(self, tmp_path):
        _, s1 = cached_setup(lambda: 1, ["a"], cache_dir=str(tmp_path))
        v, s2 = cached_setup(lambda: 2, ["b"], cache_dir=str(tmp_path))
        assert (s1, s2, v) == ("miss", "miss", 2)

    def test_code_objects_invalidate(self, tmp_path):
        # same key_data, different function source → different entries
        def f_one():
            return "one"

        def f_two():
            return "two"

        v1, s1 = cached_setup(
            f_one, ["k"], code_objects=(f_one,), cache_dir=str(tmp_path)
        )
        v2, s2 = cached_setup(
            f_two, ["k"], code_objects=(f_two,), cache_dir=str(tmp_path)
        )
        assert (s1, s2) == ("miss", "miss")
        assert (v1, v2) == ("one", "two")

    def test_corrupt_entry_rebuilds(self, tmp_path):
        key = ["c"]
        cached_setup(lambda: 7, key, cache_dir=str(tmp_path))
        (entry,) = [p for p in os.listdir(tmp_path) if p.endswith(".setup")]
        with open(os.path.join(tmp_path, entry), "wb") as f:
            f.write(b"garbage")
        v, s = cached_setup(lambda: 8, key, cache_dir=str(tmp_path))
        assert (v, s) == (8, "miss")

    def test_env_var_dir(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PGDROME_SETUP_CACHE", str(tmp_path))
        _, s1 = cached_setup(lambda: 1, ["e"])
        _, s2 = cached_setup(lambda: 1, ["e"])
        assert (s1, s2) == ("miss", "hit")
