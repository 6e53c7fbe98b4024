"""Docs-as-tests: every file in examples/ is executable with inline
asserts and runs in CI (reference pattern: `just examples`,
justfile:16-24, and tests/test_docs.py keeping docs honest)."""

from __future__ import annotations

import os
import runpy

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
EXAMPLES = sorted(f for f in os.listdir(EXAMPLES_DIR) if f.endswith(".py"))

NEEDS_SPARK = {
    "ann_search.py",
    "continuous_dedup.py",
    "curation_at_scale.py",
    "data_selection.py",
    "etf_pipeline.py",
    "kafka_concepts.py",
    "media_pipeline.py",
    "right_to_be_forgotten.py",
    "serving_dashboard.py",
    "streaming_watchdog.py",
    "tabular_concepts.py",
    "training_pipeline.py",
}


@pytest.mark.parametrize("example", EXAMPLES)
def test_example_runs(example, request):
    if example in NEEDS_SPARK:
        # reuse the session fixture so examples share the test JVM
        request.getfixturevalue("spark")
    runpy.run_path(os.path.join(EXAMPLES_DIR, example), run_name="__main__")
