"""Golden parity vs the reference's own loader (imported from /root/reference).

Verifies the data pipeline agrees with the PyTorch reference on everything
deterministic: vocab sizes, per-user split sizes, the 45-column feature
layout and the per-user/item feature blocks (one-hot category order, age
scaling). Split membership differs (both shuffles are random) by design.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

ML = "/root/reference/dataset_example/ml-100k"


@pytest.fixture(scope="module")
def ref():
    from data.reader import MovieLens100K as RefLoader

    return RefLoader(ML)


def test_vocab_and_split_sizes(ml100k, ref):
    assert ml100k.num_users == ref.num_users
    assert ml100k.num_items == ref.num_items
    # per-user split sizes are deterministic given the 60/20/20 rule
    ref_train_counts = ref.train.groupby("user_id").size()
    for u in [0, 7, 42, 500, 942]:
        ours = int((ml100k.train["user"] == u).sum())
        assert ours == int(ref_train_counts.get(u, 0))
    assert len(ml100k.train["user"]) == len(ref.train)
    assert len(ml100k.valid["user"]) == len(ref.valid)
    assert len(ml100k.test["user"]) == len(ref.test)


def test_feature_layout_matches_reference(ml100k, ref):
    """Reference feature() row for (u, i) == our user/item feature blocks."""
    feat = ref.feature(ref.train.head(200))
    cols = list(feat.columns)
    assert cols[:3] == ["user_id", "item_id", "rating"]
    mat = feat.drop(columns=["rating"]).to_numpy(dtype=np.float32)
    for r in range(0, 200, 37):
        u, i = int(mat[r, 0]), int(mat[r, 1])
        np.testing.assert_allclose(
            mat[r, 2:26], ml100k.user_features[u], atol=1e-6
        )
        np.testing.assert_allclose(
            mat[r, 26:45], ml100k.item_features[i], atol=1e-6
        )


def test_rating_all_ones(ml100k, ref):
    assert (ref.data["rating"] == 1).all()
    assert (ml100k.data["rating"] == 1).all()
