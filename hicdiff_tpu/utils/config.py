"""Config helpers (src/config.py:5-13 parity: yaml dict -> attribute namespace)."""
from __future__ import annotations

import argparse

__all__ = ["dict2namespace"]


def dict2namespace(config: dict) -> argparse.Namespace:
    namespace = argparse.Namespace()
    for key, value in config.items():
        if isinstance(value, dict):
            new_value = dict2namespace(value)
        else:
            new_value = value
        setattr(namespace, key, new_value)
    return namespace
