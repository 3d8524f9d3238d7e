"""Docs-vs-artifact drift guards (r10 verdict item 2): README's
local-registry count recurred out of sync twice (133 vs 134 in r9,
148 vs 149 in r10) because it was hand-typed.  It is now emitted by
tools/minidriver.py on every full-registry run; these tests pin that the
committed README matches the committed artifact AND the live registry."""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _readme_claim():
    with open(os.path.join(REPO, "README.md")) as f:
        txt = f.read()
    m = re.search(
        r"`(CORRECTNESS_LOCAL_r\d+\.json)`, (\d+)/(\d+) green", txt
    )
    assert m, "README must cite the local correctness artifact"
    return m.group(1), int(m.group(2)), int(m.group(3))


def test_readme_count_matches_cited_artifact():
    fname, claimed_green, claimed_total = _readme_claim()
    path = os.path.join(REPO, fname)
    assert os.path.exists(path), f"README cites a missing artifact {fname}"
    with open(path) as f:
        data = json.load(f)
    n_green = sum(
        1 for v in data.values()
        if v["rows_match"] and v["schema_match"] and v["hash_match"]
    )
    assert claimed_total == len(data), (claimed_total, len(data))
    assert claimed_green == n_green, (claimed_green, n_green)


def test_readme_cites_newest_local_artifact():
    fname, _, _ = _readme_claim()
    rounds = [
        int(re.search(r"_r(\d+)\.json$", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_LOCAL_r*.json"))
    ]
    cited = int(re.search(r"_r(\d+)\.json$", fname).group(1))
    assert cited == max(rounds), (cited, max(rounds))


def test_registry_size_not_behind_cited_artifact():
    """The live registry may only grow relative to the committed
    artifact (rows are added, never silently dropped)."""
    import __spark_entry__ as entrymod

    fname, _, claimed_total = _readme_claim()
    assert len(entrymod.queries()) >= claimed_total
