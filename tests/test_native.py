"""Native C++ parser vs NumPy reference path: bit-identical pipeline output."""

import os

import numpy as np
import pytest

from deeplearningrecommendationsystem_tpu.data import MovieLens100K
from deeplearningrecommendationsystem_tpu.data import native

ML = os.environ.get("ML100K_PATH", "/root/reference/dataset_example/ml-100k")


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_matches_numpy_pipeline():
    a = MovieLens100K(ML, seed=0, use_native=True)
    b = MovieLens100K(ML, seed=0, use_native=False)
    np.testing.assert_array_equal(a.data["user"], b.data["user"])
    np.testing.assert_array_equal(a.data["item"], b.data["item"])
    np.testing.assert_allclose(a.user_features, b.user_features, atol=1e-6)
    np.testing.assert_array_equal(a.item_features, b.item_features)
    assert a.occupation_categories == b.occupation_categories
    # same RNG seed + same row order => identical splits
    for s_a, s_b in zip((a.train, a.valid, a.test), (b.train, b.valid, b.test)):
        np.testing.assert_array_equal(s_a["user"], s_b["user"])
        np.testing.assert_array_equal(s_a["item"], s_b["item"])


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_parse_u_data_counts():
    users, items, ratings = native.parse_u_data(os.path.join(ML, "u.data"))
    assert len(users) == 100_000
    assert users.min() == 0 and users.max() == 942
    assert items.min() == 0 and items.max() == 1681
    assert set(np.unique(ratings)) <= {1.0, 2.0, 3.0, 4.0, 5.0}
