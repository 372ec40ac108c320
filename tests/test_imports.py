"""Every module in the package imports cleanly (no stale references)."""

import importlib
import pkgutil

import internvideo_tpu


def test_all_modules_import():
    failures = []
    for mod in pkgutil.walk_packages(
        internvideo_tpu.__path__, prefix="internvideo_tpu."
    ):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001
            failures.append((mod.name, f"{type(e).__name__}: {e}"))
    assert not failures, failures
