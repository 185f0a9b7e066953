"""CLI smoke: --list and a tiny end-to-end run with JSON output."""

import json

from deeplearningrecommendationsystem_tpu.cli.run import main


def test_list(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    for name in ("mf", "deepfm", "din", "autorec"):
        assert name in out


def test_tiny_run_json(capsys):
    assert main(["--model", "mf", "--epochs", "2", "--json", "--seed", "1"]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(out)
    assert payload["model"] == "mf"
    assert "test_auc" in payload["final"]
    assert "test" in payload["ranking"]
    assert payload["examples_per_sec"] > 0


def test_cf_cli_usercf_json(capsys):
    from deeplearningrecommendationsystem_tpu.cli.cf import main as cf_main

    assert cf_main(["usercf", "--json"]) == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["algo"] == "usercf" and payload["fold"] == "ua"
    assert payload["recall"] > 0.10 and payload["precision"] > 0.10


def test_cf_cli_gdcf_json(capsys):
    from deeplearningrecommendationsystem_tpu.cli.cf import main as cf_main

    assert cf_main(["gdcf", "--iterations", "3", "--embedding-size", "16", "--json"]) == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["fold"] == "u1"
    assert len(payload["loss"]) == 3
    assert payload["loss"][-1] < payload["loss"][0]


def test_tiny_run_bf16_and_plot(tmp_path, capsys):
    pytest = __import__("pytest")
    pytest.importorskip("matplotlib")
    out_png = tmp_path / "curves.png"
    assert (
        main(
            [
                "--model", "mf", "--epochs", "2", "--json",
                "--compute-dtype", "bfloat16", "--plot", str(out_png),
            ]
        )
        == 0
    )
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["model"] == "mf"
    assert out_png.exists() and out_png.stat().st_size > 0


def test_sparse_train_mode_json(capsys):
    assert main([
        "--model", "mf", "--epochs", "2", "--train-mode", "sparse",
        "--batch-size", "4096", "--json",
    ]) == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["model"] == "mf"
    assert payload["final"]["train_loss"] > 0
    assert payload["ranking"]["test"]["recall"] >= 0
