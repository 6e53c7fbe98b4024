"""Docs honesty checks (reference pattern: tests/test_docs.py asserts
README == docs/index.md; example files are executed by
tests/test_examples.py)."""

from __future__ import annotations

import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(*parts: str) -> str:
    with open(os.path.join(ROOT, *parts)) as fh:
        return fh.read()


def test_readme_matches_docs_index():
    assert _read("README.md") == _read("docs", "index.md")


def test_concept_pages_reference_real_things():
    """Every module path and examples/ file mentioned in concept pages
    must exist — docs can't drift to deleted code."""
    docs_dir = os.path.join(ROOT, "docs", "concepts")
    for page in os.listdir(docs_dir):
        text = _read("docs", "concepts", page)
        for mod in re.findall(r"`(beavers_spark[.\w]*)`", text):
            # may name a module or a module.Attribute — accept either
            parts = mod.split(".")
            candidates = [parts, parts[:-1]] if len(parts) > 1 else [parts]
            assert any(
                os.path.exists(os.path.join(ROOT, *c[:-1], c[-1] + ".py"))
                or os.path.isdir(os.path.join(ROOT, *c))
                for c in candidates
                if c
            ), f"{page}: {mod}"
        for ex in re.findall(r"`(examples/[\w.]+)`", text):
            assert os.path.exists(os.path.join(ROOT, ex)), f"{page}: {ex}"
        for tool in re.findall(r"`(tools/[\w.]+)`", text):
            assert os.path.exists(os.path.join(ROOT, tool)), f"{page}: {tool}"
