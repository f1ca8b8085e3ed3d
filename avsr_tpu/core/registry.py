"""Minimal component registry.

Connectors, schedules, and datasets register themselves by name so config
strings resolve to builders without import cycles. The reference hard-codes
its factory map (modality_connector.py:386-392) and silently falls back to
"deep" on unknown names (:394-396); here unknown names raise, listing valid
options.
"""

from __future__ import annotations

from typing import Any, Callable


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._items: dict[str, Callable[..., Any]] = {}

    def register(self, name: str) -> Callable[[Callable[..., Any]], Callable[..., Any]]:
        def deco(fn: Callable[..., Any]) -> Callable[..., Any]:
            if name in self._items:
                raise KeyError(f"{self.kind} {name!r} already registered")
            self._items[name] = fn
            return fn
        return deco

    def get(self, name: str) -> Callable[..., Any]:
        if name not in self._items:
            raise KeyError(
                f"Unknown {self.kind} {name!r}; valid: {sorted(self._items)}")
        return self._items[name]

    def names(self) -> list[str]:
        return sorted(self._items)

    def __contains__(self, name: str) -> bool:
        return name in self._items


CONNECTORS = Registry("connector")
SCHEDULES = Registry("schedule")
DATASETS = Registry("dataset")
