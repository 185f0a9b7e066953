"""README numbers cannot go stale (VERDICT r4 next #1).

Every performance/quality number README.md quotes lives between
``<!-- gen:NAME -->`` markers and is rendered by tools/gen_readme.py from the
artifact of record. This test re-renders each block from the artifacts on
disk and fails if the README differs -- i.e. committing new bench artifacts
without regenerating the README (or hand-editing a number) breaks the suite.
"""

import importlib.util
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gen_readme():
    spec = importlib.util.spec_from_file_location(
        "gen_readme", os.path.join(ROOT, "tools", "gen_readme.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_readme_blocks_match_artifacts():
    gen = _gen_readme()
    with open(os.path.join(ROOT, "README.md")) as f:
        readme = f.read()
    blocks = gen.render_blocks()
    assert blocks, "generator produced no blocks"
    for name, body in blocks.items():
        m = re.search(
            rf"<!-- gen:{name} -->\n(.*?)<!-- /gen:{name} -->", readme, re.S
        )
        assert m, f"README.md lost the gen:{name} markers"
        on_disk = m.group(1).rstrip("\n")
        assert on_disk == body, (
            f"README.md gen:{name} block is STALE vs the artifacts -- run "
            f"`python tools/gen_readme.py`.\n--- on disk ---\n{on_disk}\n"
            f"--- rendered ---\n{body}"
        )


def test_readme_quotes_no_unmarked_speedups():
    """Volatile numbers (NNNx speedups, M ex/s throughputs) must only appear
    inside generated blocks -- hand-typed ones are how the r2-r4 staleness
    happened."""
    gen = _gen_readme()
    with open(os.path.join(ROOT, "README.md")) as f:
        readme = f.read()
    stripped = re.sub(r"<!-- gen:\w+ -->\n.*?<!-- /gen:\w+ -->", "", readme,
                      flags=re.S)
    # speedup-looking tokens: a number immediately followed by the times sign
    volatile = [
        tok for tok in re.findall(r"\b\d+(?:[.,]\d+)?×", stripped)
        # structural constants, not measurements: the ≥5x target and the
        # ~10x host-contention warning live in prose
        # "1× TPU v5e chip" in the section heading is hardware, not a result
        if tok not in ("1×", "5×", "10×")
    ]
    assert not volatile, (
        f"README.md quotes speedups outside generated blocks: {volatile} -- "
        "move them into a gen: block in tools/gen_readme.py"
    )
    throughputs = re.findall(r"\b\d+(?:\.\d+)?M ex/s", stripped)
    assert not throughputs, (
        f"README.md quotes throughputs outside generated blocks: {throughputs}"
    )


def test_performance_doc_roofline_matches_artifact():
    import json

    import pytest

    path = os.path.join(ROOT, "ROOFLINE.json")
    if not os.path.exists(path):
        pytest.skip("ROOFLINE.json not generated yet (tools/roofline.py)")
    gen = _gen_readme()
    with open(path) as f:
        roofline = json.load(f)
    with open(os.path.join(ROOT, "docs", "performance.md")) as f:
        doc = f.read()
    m = re.search(r"<!-- gen:roofline -->\n(.*?)<!-- /gen:roofline -->", doc, re.S)
    assert m, "docs/performance.md lost the gen:roofline markers"
    assert m.group(1).rstrip("\n") == gen.render_roofline(roofline), (
        "docs/performance.md roofline table is STALE vs ROOFLINE.json -- "
        "re-run `python tools/roofline.py`"
    )


def test_generator_is_idempotent():
    gen = _gen_readme()
    with open(os.path.join(ROOT, "README.md")) as f:
        readme = f.read()
    assert gen.apply(readme, gen.render_blocks()) == readme
