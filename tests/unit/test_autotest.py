"""Environment smoke test (reference tests/unit/test_autotest.py parity):
the package imports, its core symbols resolve, the native lib loads."""

import unittest


class EnvironmentTest(unittest.TestCase):
    def test_import(self):
        import pgdrome_tpu

        assert pgdrome_tpu.__version__
        assert callable(pgdrome_tpu.PGDProblem)
        assert callable(pgdrome_tpu.SeparatedPGD)

    def test_backend(self):
        import jax

        assert jax.default_backend() == "cpu"  # conftest pins tests to CPU
        assert len(jax.devices()) == 8  # virtual sharding mesh

    def test_sanity(self):
        self.assertAlmostEqual(2.0, 2.0)  # the reference's famous assertion


if __name__ == "__main__":
    unittest.main()
