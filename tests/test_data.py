"""Data pipeline semantics vs the reference loader (data/reader.py)."""

import numpy as np


def test_counts(ml100k):
    assert ml100k.num_users == 943
    assert ml100k.num_items == 1682
    total = sum(len(s["user"]) for s in (ml100k.train, ml100k.valid, ml100k.test))
    assert total == 100_000


def test_feature_blocks(ml100k):
    # [age, gender(2), occupation(21)] = 24 user cols; 19 genre cols
    assert ml100k.user_features.shape == (943, 24)
    assert ml100k.item_features.shape == (1682, 19)
    assert 0.0 <= ml100k.user_features[:, 0].min() and ml100k.user_features[:, 0].max() == 1.0
    # one-hot blocks sum to one
    assert np.allclose(ml100k.user_features[:, 1:3].sum(1), 1.0)
    assert np.allclose(ml100k.user_features[:, 3:].sum(1), 1.0)
    assert len(ml100k.occupation_categories) == 21


def test_split_per_user_60_20_20(ml100k):
    users = ml100k.data["user"]
    for u in [0, 42, 942]:
        n = int((users == u).sum())
        n_tr = int((ml100k.train["user"] == u).sum())
        n_va = int((ml100k.valid["user"] == u).sum())
        n_te = int((ml100k.test["user"] == u).sum())
        assert n_tr == int(n * 0.6)
        assert n_va == int(n * 0.2)
        assert n_tr + n_va + n_te == n


def test_splits_disjoint(ml100k):
    def pairs(s):
        return set(zip(s["user"].tolist(), s["item"].tolist()))

    tr, va, te = map(pairs, (ml100k.train, ml100k.valid, ml100k.test))
    assert not (tr & va) and not (tr & te) and not (va & te)
    assert len(tr | va | te) == 100_000


def test_implicit_ratings_are_one(ml100k):
    assert (ml100k.train["rating"] == 1).all()


def test_feature_matrix_layout(ml100k):
    X = ml100k.feature_matrix(ml100k.train)
    assert X.shape == (len(ml100k.train["user"]), 45)
    assert (X[:, 0] == ml100k.train["user"]).all()
    assert (X[:, 1] == ml100k.train["item"]).all()
    # row features match the user/item blocks
    r = 123
    u, i = int(X[r, 0]), int(X[r, 1])
    assert np.allclose(X[r, 2:26], ml100k.user_features[u])
    assert np.allclose(X[r, 26:], ml100k.item_features[i])


def test_itemid_matrix_padding(ml100k):
    m = ml100k.itemid_matrix(ml100k.valid)
    assert m.shape[0] == 943
    counts = (m >= 0).sum(1)
    for u in [0, 10, 500]:
        assert counts[u] == (ml100k.valid["user"] == u).sum()


def test_history_matrix(ml100k):
    h = ml100k.history_matrix(ml100k.train, hist_len=10)
    assert h.shape == (943, 10)
    # every user has >= 10 train items on ml-100k (min 20 ratings * 0.6 = 12)
    first_items = [i for u, i in zip(ml100k.train["user"], ml100k.train["item"]) if u == 0][:10]
    assert h[0].tolist() == first_items


def test_seen_mask(ml100k):
    m = ml100k.seen_mask(ml100k.train, ml100k.valid)
    assert m.shape == (943, 1682)
    assert m.sum() == len(ml100k.train["user"]) + len(ml100k.valid["user"])


def test_rating_matrix(ml100k):
    neg = {"user": np.array([0, 1]), "item": np.array([50, 60]), "rating": np.zeros(2)}
    # ensure chosen pairs are not positives
    m = ml100k.rating_matrix(negatives=neg)
    assert m.shape == (943, 1682)
    pos = ml100k.data
    assert (m[pos["user"], pos["item"]] == 1.0).all()
    vals = np.unique(m)
    assert set(vals.tolist()) <= {0.0, 0.5, 1.0}


def test_cross_features(ml100k):
    X = ml100k.cross_features(np.array([3, 5]))
    assert X.shape == (2 * 1682, 45)
    assert (X[:1682, 0] == 3).all() and (X[1682:, 0] == 5).all()
    assert (X[:1682, 1] == np.arange(1682)).all()
