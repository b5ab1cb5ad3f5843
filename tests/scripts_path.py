"""Helper: make repo-root scripts/ importable from tests."""
import os
import sys


def add_scripts_path() -> None:
    scripts = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts")
    if scripts not in sys.path:
        sys.path.insert(0, scripts)
