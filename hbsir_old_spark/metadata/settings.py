"""Layered settings cascade (reference parity:
/root/reference/hbsir/core/metadata_reader.py:216-256): package defaults ->
package overrides -> project overrides, later layers winning per key, with
nested dicts merged recursively and dotted-path access.

Driver-side pure Python; `HBSIREngine` reads its knobs (year span, weight
source threshold, default classification) through one of these.
"""

from __future__ import annotations

import copy
from typing import Any, Mapping

#: engine defaults (the reference's default_settings.yaml surface that is
#: still meaningful on Spark)
PACKAGE_DEFAULTS: dict = {
    "years": {"first": 1363, "last": 1401},
    "weights": {"household_info_from_year": 1396},
    "columns": {"year": "Year", "id": "ID", "weight": "Weight", "commodity_code": "Code"},
    "classification": {"default": "original"},
    "groupers": ["Year", "Urban_Rural", "Province", "County", "Decile", "Percentile"],
}


def _merge(base: dict, override: Mapping) -> dict:
    out = dict(base)
    for key, value in override.items():
        if isinstance(value, Mapping) and isinstance(out.get(key), Mapping):
            out[key] = _merge(out[key], value)
        else:
            out[key] = copy.deepcopy(value)
    return out


class Settings:
    """Immutable layered settings with dotted-path lookup.

    >>> s = Settings({"a": {"b": 1}}, {"a": {"c": 2}})
    >>> s["a.b"], s["a.c"]
    (1, 2)
    """

    def __init__(self, *layers: Mapping | None):
        merged: dict = {}
        for layer in layers:
            if layer:
                merged = _merge(merged, layer)
        self._data = merged

    @classmethod
    def with_defaults(cls, *overrides: Mapping | None) -> "Settings":
        return cls(PACKAGE_DEFAULTS, *overrides)

    def __getitem__(self, dotted: str) -> Any:
        node: Any = self._data
        for part in dotted.split("."):
            if not isinstance(node, Mapping) or part not in node:
                raise KeyError(dotted)
            node = node[part]
        return node

    def get(self, dotted: str, default: Any = None) -> Any:
        try:
            return self[dotted]
        except KeyError:
            return default

    def as_dict(self) -> dict:
        return copy.deepcopy(self._data)
