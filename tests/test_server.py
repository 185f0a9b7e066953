"""HTTP serving daemon: live-socket endpoint coverage (server.py)."""

import json
import urllib.request

import jax
import numpy as np
import pytest

from deeplearningrecommendationsystem_tpu.models import MatrixFactorization
from deeplearningrecommendationsystem_tpu.server import RecommenderServer
from deeplearningrecommendationsystem_tpu.serving import Recommender

from tests.test_serving import make_ctx

U, I = 30, 40


@pytest.fixture(scope="module")
def server():
    model = MatrixFactorization(U, I, 8)
    params = model.init(jax.random.PRNGKey(0))
    seen = np.zeros((U, I), dtype=bool)
    seen[0, :35] = True
    srv = RecommenderServer(
        Recommender(model, params, make_ctx(U, I), seen=seen)
    ).serve_background()
    yield srv
    srv.shutdown()


def _get(srv, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}") as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(srv, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    code, payload = _get(server, "/healthz")
    assert code == 200
    assert payload == {"status": "ok", "num_users": U, "num_items": I}


def test_get_recommend_respects_seen_mask(server):
    code, payload = _get(server, "/v1/recommend?user=0&k=5")
    assert code == 200
    assert set(payload["items"]) <= set(range(35, 40))  # user 0's unseen tail
    assert payload["scores"] == sorted(payload["scores"], reverse=True)


def test_post_recommend_batch(server):
    code, payload = _post(server, "/v1/recommend", {"users": [2, 7], "k": 3})
    assert code == 200
    assert len(payload["items"]) == 2 and len(payload["items"][0]) == 3


def test_score_matches_recommender(server):
    code, payload = _post(server, "/v1/score", {"user": 1, "items": [0, 1, 2]})
    assert code == 200
    expected = np.asarray(server.recommender.score(1, [0, 1, 2]))
    np.testing.assert_allclose(payload["scores"], expected, atol=1e-6)


def test_refresh_and_stats(server):
    assert _post(server, "/v1/refresh", {})[0] == 200
    code, payload = _get(server, "/v1/stats")
    assert code == 200
    assert payload["requests"] >= 1
    assert "latency_ms" in payload


def test_bad_requests(server):
    assert _get(server, "/v1/recommend")[0] == 400  # missing ?user=
    assert _post(server, "/v1/recommend", {"users": []})[0] == 400
    assert _post(server, "/v1/score", {"user": 1})[0] == 400
    assert _get(server, "/nope")[0] == 404


@pytest.fixture(scope="module")
def sharded_server():
    """Daemon over a ShardedRecommender on the virtual mesh (cli.serve
    --mesh path, VERDICT r4 next #5)."""
    from deeplearningrecommendationsystem_tpu.parallel import (
        make_mesh,
        shard_model_tables,
    )
    from deeplearningrecommendationsystem_tpu.serving import ShardedRecommender

    mesh = make_mesh(data=2, model=4)
    model = MatrixFactorization(U, I, 8)
    params = model.init(jax.random.PRNGKey(0))
    sharded, _, _ = shard_model_tables(params, mesh)
    seen = np.zeros((U, I), dtype=bool)
    seen[0, :35] = True
    srv = RecommenderServer(
        ShardedRecommender(model, sharded, make_ctx(U, I), mesh, seen=seen)
    ).serve_background()
    dense = Recommender(model, params, make_ctx(U, I), seen=seen,
                        use_pallas=False)
    yield srv, dense
    srv.shutdown()


def test_sharded_server_end_to_end(sharded_server):
    srv, dense = sharded_server
    code, payload = _get(srv, "/healthz")
    assert code == 200 and payload["num_users"] == U
    code, payload = _get(srv, "/v1/recommend?user=0&k=5")
    assert code == 200
    np.testing.assert_array_equal(payload["items"], dense.top_k(5, [0])[0])
    code, payload = _post(srv, "/v1/score", {"user": 1, "items": [0, 1, 2]})
    assert code == 200
    np.testing.assert_allclose(
        payload["scores"], dense.score(1, [0, 1, 2]), atol=1e-5
    )
    assert _get(srv, "/v1/stats")[0] == 200


def test_cli_serve_mesh_flag_builds_sharded_recommender(tmp_path):
    """cli.serve --mesh trains EP + serves sharded (no unshard round-trip)."""
    from deeplearningrecommendationsystem_tpu.cli import serve as cli_serve
    from deeplearningrecommendationsystem_tpu.serving import ShardedRecommender

    class Args:
        model = "mf"
        data = None
        epochs = 2
        seed = 0
        checkpoint = None
        host = "127.0.0.1"
        port = 0
        exclude_seen = True
        mesh = "2,4"

    from deeplearningrecommendationsystem_tpu.experiments import DEFAULT_DATA

    Args.data = DEFAULT_DATA
    srv = cli_serve.build_server(Args)
    try:
        assert isinstance(srv.recommender, ShardedRecommender)
        # trained tables stayed sharded: padded vocab heights
        assert srv.recommender.params["item"].shape[0] % 4 == 0
        srv.serve_background()
        code, payload = _get(srv, "/v1/recommend?user=3&k=5")
        assert code == 200 and len(payload["items"]) == 5
    finally:
        srv.shutdown()


def test_out_of_range_user_is_500_not_crash(server):
    code, payload = _post(server, "/v1/recommend", {"users": [999], "k": 3})
    assert code == 500
    assert "error" in payload
    # server still alive afterwards
    assert _get(server, "/healthz")[0] == 200


def test_cli_serve_mesh_rejects_sequence_models():
    """--mesh validation happens BEFORE training: sequence models cannot
    serve from sharded tables (parallel/serving.py routing)."""
    from deeplearningrecommendationsystem_tpu.cli import serve as cli_serve
    from deeplearningrecommendationsystem_tpu.experiments import DEFAULT_DATA

    class Args:
        model = "din"
        data = DEFAULT_DATA
        epochs = 1
        seed = 0
        checkpoint = None
        host = "127.0.0.1"
        port = 0
        exclude_seen = True
        mesh = "2,4"

    with pytest.raises(SystemExit, match="cannot serve"):
        cli_serve.build_server(Args)
