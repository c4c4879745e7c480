"""Execute the documentation examples (reference keeps its tutorials
runnable via ``tests/functional/test_document_examples.py``)."""

import re

import numpy as np

import elfi_tpu as elfi


import pytest

pytestmark = pytest.mark.slow  # excluded from the fast CI gate

def _doc_code_blocks(path):
    text = open(path).read()
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


def test_implementing_methods_doc(ma2):
    blocks = _doc_code_blocks("docs/implementing_methods.md")
    assert len(blocks) == 2
    ns = {}
    exec(blocks[0], ns)  # the class definition
    method = ns["MinDiscrepancySearch"](ma2["d"], batch_size=1000, seed=0)
    res = method.infer(n_sim=20_000, bar=False)
    assert set(res.samples) == {"t1", "t2"}
    d_best = float(np.ravel(res.outputs["d"])[0])
    assert 0 <= d_best < res.meta["mean_discrepancy"]
    # deterministic per seed
    m2 = ns["MinDiscrepancySearch"](ma2["d"], batch_size=1000, seed=0)
    res2 = m2.infer(n_sim=20_000, bar=False)
    np.testing.assert_array_equal(res.samples_array, res2.samples_array)


def test_methods_doc_snippets_are_valid_python(ma2):
    for block in _doc_code_blocks("docs/methods.md"):
        compile(block, "<docs/methods.md>", "exec")


def _exec_doc(path):
    """Execute every python block of a doc in one shared module namespace
    (a real module so classes defined in the doc pickle, as they would in
    a user script; the reference executes its tutorials the same way)."""
    import sys
    import types

    mod_name = "doc_exec_" + re.sub(r"\W", "_", path)
    mod = types.ModuleType(mod_name)
    sys.modules[mod_name] = mod
    try:
        for i, block in enumerate(_doc_code_blocks(path)):
            try:
                exec(compile(block, f"<{path} block {i}>", "exec"),
                     mod.__dict__)
            except Exception as e:
                raise AssertionError(
                    f"{path} block {i} failed: {e}\n--- block ---\n{block}"
                ) from e
        return mod.__dict__
    finally:
        sys.modules.pop(mod_name, None)


def test_tutorial_doc():
    _exec_doc("docs/tutorial.md")


def test_parallelization_doc():
    _exec_doc("docs/parallelization.md")


def test_bolfi_doc():
    _exec_doc("docs/bolfi.md")


def test_external_doc(tmp_path):
    import os
    import shutil

    import pytest
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    cwd = os.getcwd()
    docs = os.path.join(cwd, "docs", "external.md")
    try:
        os.chdir(tmp_path)   # bdm compiles ./bdm + writes exchange files
        _exec_doc(docs)
    finally:
        os.chdir(cwd)
