"""Every ``python`` code block in README.md / MIGRATING.md executes.

A user of the reference switching over meets these snippets first; this
guards them against doc rot (renamed symbols, changed signatures, perf
claims attached to calls that no longer run). Blocks importing the
REFERENCE package (`ai_safety_gridworlds.`) are before/after
illustrations and are skipped — they need absl flag bootstrapping and
exist to show the old API, not to run here.

Each block runs in its own namespace, in order within its file (later
blocks in a file may build on earlier ones, so the namespace carries
over per file).
"""

import pathlib
import re

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
DOCS = ("README.md", "MIGRATING.md")


def _blocks(doc):
    text = (ROOT / doc).read_text()
    return re.findall(r"```python\n(.*?)```", text, re.S)


CASES = [
    (doc, i, block)
    for doc in DOCS
    for i, block in enumerate(_blocks(doc))
]


@pytest.mark.parametrize(
    "doc,idx,block",
    CASES,
    ids=[f"{doc}-{i}" for doc, i, _ in CASES],
)
def test_doc_snippet_runs(doc, idx, block):
    if "from ai_safety_gridworlds." in block or (
        "import ai_safety_gridworlds." in block
    ):
        pytest.skip("reference-package illustration block")
    ns = _doc_namespaces.setdefault(doc, {})
    exec(compile(block, f"{doc}[block {idx}]", "exec"), ns)


_doc_namespaces = {}
