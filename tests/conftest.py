from __future__ import annotations

import numpy as np
import pytest

from lshrs_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lshrs_spark_tests", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


@pytest.fixture()
def small_vectors(rng):
    """(ids, vectors) — 30 seeded Gaussian vectors, dim=32."""
    vecs = rng.standard_normal((30, 32)).astype(np.float32)
    return list(range(30)), vecs


def load_reference_hasher():
    """Load the reference's pure-numpy hash module directly from
    /root/reference (read-only) for differential tests, without importing
    the redis-dependent package root."""
    import importlib.util
    import sys
    import types

    if "lshrs.hash.lsh" in sys.modules:
        return sys.modules["lshrs.hash.lsh"]
    for name in ("lshrs", "lshrs._config", "lshrs.hash"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("lshrs._config.config", "/root/reference/lshrs/_config/config.py")
    return load("lshrs.hash.lsh", "/root/reference/lshrs/hash/lsh.py")
