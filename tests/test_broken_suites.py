"""A missing/broken optional suite must fail the smoke check loudly, never
silently shrink queries() (VERDICT r1 'What's wrong' #2)."""

from __future__ import annotations

import builtins
import importlib
import sys

import pytest

TARGET = "datafusion_table_providers_spark.llm.curation"
SUITE_MOD = "datafusion_table_providers_spark.suite"


def test_broken_suite_recorded_on_import_error(monkeypatch):
    """Force one optional suite module to fail import and re-execute the
    registry assembly: the failure must land in BROKEN_SUITES, not vanish."""
    orig_import = builtins.__import__

    def fake_import(name, *a, **kw):
        if name == TARGET:
            raise ImportError("simulated missing executor dependency")
        return orig_import(name, *a, **kw)

    saved = {k: v for k, v in sys.modules.items() if k.startswith(TARGET)}
    for k in saved:
        monkeypatch.delitem(sys.modules, k)
    monkeypatch.delitem(sys.modules, SUITE_MOD, raising=False)
    monkeypatch.setattr(builtins, "__import__", fake_import)
    try:
        reloaded = importlib.import_module(SUITE_MOD)
        assert any(m == TARGET for m, _ in reloaded.BROKEN_SUITES), (
            f"import failure of {TARGET} not recorded: "
            f"{reloaded.BROKEN_SUITES}"
        )
        assert not any(n.startswith("d13") for n in reloaded.FULL_SUITE)
    finally:
        # restore the real modules for the rest of the test session
        monkeypatch.setattr(builtins, "__import__", orig_import)
        sys.modules.pop(SUITE_MOD, None)
        sys.modules.update(saved)
        importlib.import_module(SUITE_MOD)


def test_entry_raises_on_broken_suites(monkeypatch):
    import __spark_entry__ as entrymod

    monkeypatch.setattr(
        entrymod, "BROKEN_SUITES", [("some.module", "ImportError: nope")]
    )
    with pytest.raises(ImportError, match="some.module"):
        entrymod.entry(None)
