"""Execute the tutorial notebook's code cells end-to-end (CPU backend).

The reference ships a runnable tutorial (/root/reference/tutorial.ipynb);
ours (examples/tutorial.ipynb) must stay executable, so every code cell is
run in one shared namespace, in order, like a kernel would."""

import json
import os

import pytest

NB = os.path.join(os.path.dirname(__file__), "..", "examples", "tutorial.ipynb")


@pytest.mark.skipif(
    not os.path.exists("/root/reference/examples/eng.aspell.lexicon"),
    reason="reference example data not present",
)
def test_tutorial_notebook_executes():
    with open(NB) as f:
        nb = json.load(f)
    ns = {}
    ran = 0
    for cell in nb["cells"]:
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        # drop notebook magics / shell escapes
        src = "\n".join(
            line for line in src.split("\n")
            if not line.lstrip().startswith(("%", "!"))
        )
        exec(compile(src, f"tutorial-cell-{ran}", "exec"), ns)
        ran += 1
    assert ran >= 10
    # spot-check the state the notebook built up
    assert ns["model"].find_variants("seperate", ns["SearchParameters"]())
    best = ns["model2"].find_variants(
        "seperate",
        ns["SearchParameters"](max_anagram_distance=2, max_edit_distance=2),
    )[0]
    assert best["text"] == "separate"
