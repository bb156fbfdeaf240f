"""YAML config loading (reference: ``src/utils/config_loader.py:3-5``)."""

from __future__ import annotations

from typing import Any

import yaml


def load_yaml_config(path: str) -> dict[str, Any]:
    with open(path) as fh:
        return yaml.safe_load(fh)
