"""Year-versioned metadata resolution.

Capability parity with the reference's resolver
(/root/reference/hbsir/utils/metadata_utils.py:52-363):

* **simple versioning** — a dict whose keys are all years (within
  ``year_range``) resolves to the value under the greatest key <= the query
  year ({} if none qualify → treated as "absent this year" → None).
* **keyword versioning** — a dict with a ``versions`` key: the selected
  version inherits the dict's other keys (without overwriting its own).
* resolution recurses through nested dicts and lists; a version resolving to
  ``None``/``{}`` means "not present this year" (used to disable pipeline
  steps from a given year on).
* **categorization** — classification ``items`` whose entries carry
  ``categories`` are flattened into a list of records, each stamped with an
  ``item_key``; shared item keys are copied into each category record.

All pure driver-side Python; outputs feed the Spark compilers.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass


@dataclass(frozen=True)
class ResolverSettings:
    year_range: tuple[int, int] = (1350, 1450)
    year_keyword: str = "year"
    version_keyword: str = "versions"
    items_keyword: str = "items"
    categories_keyword: str = "categories"
    item_key_name: str = "item_key"


_DEFAULT = ResolverSettings()


def _version_kind(d: dict, settings: ResolverSettings) -> str:
    if settings.version_keyword in d:
        return "keyword"
    if not d:
        return "plain"
    lo, hi = settings.year_range
    for key in d:
        if isinstance(key, bool) or not isinstance(key, int) or not lo <= key <= hi:
            return "plain"
    return "simple"


def is_versioned(element, settings: ResolverSettings = _DEFAULT) -> bool:
    """True if any nested element carries version structure."""
    if isinstance(element, dict):
        if _version_kind(element, settings) != "plain":
            return True
        return any(is_versioned(v, settings) for v in element.values())
    if isinstance(element, list):
        return any(is_versioned(v, settings) for v in element)
    return False


def resolve_versioned(element, year: int, settings: ResolverSettings = _DEFAULT):
    """Resolve every versioned dict in ``element`` for ``year``.

    Returns a deep, independent structure (inputs are never mutated).
    A version that resolves to ``{}``/``None`` returns ``None``.
    """
    if element is None or isinstance(element, (int, float, str, bool)):
        return element
    if isinstance(element, list):
        return [resolve_versioned(v, year, settings) for v in element]
    if not isinstance(element, dict):
        raise TypeError(f"cannot resolve metadata element of type {type(element)}")

    kind = _version_kind(element, settings)
    if kind == "plain":
        return {k: resolve_versioned(v, year, settings) for k, v in element.items()}

    if kind == "simple":
        chosen_key = max((k for k in element if k <= year), default=None)
        chosen = element.get(chosen_key) if chosen_key is not None else None
    else:  # keyword
        versions = element[settings.version_keyword]
        chosen_key = max((k for k in versions if k <= year), default=None)
        chosen = versions.get(chosen_key) if chosen_key is not None else None
        chosen = {} if chosen is None else copy.deepcopy(chosen)
        if isinstance(chosen, dict):
            for key, value in element.items():
                if key != settings.version_keyword and key not in chosen:
                    chosen[key] = copy.deepcopy(value)
    if chosen == {} or chosen is None:
        return None
    return resolve_versioned(chosen, year, settings)


def categorize_items(metadata: dict, year: int,
                     settings: ResolverSettings = _DEFAULT) -> dict:
    """Resolve ``metadata`` for ``year`` and flatten classification items.

    Each entry of ``metadata["items"]`` becomes one record per category,
    inheriting the item's shared keys and stamped with ``item_key`` (the item
    name, stripped of leading/trailing underscores).
    """
    resolved = resolve_versioned(metadata, year, settings)
    if not isinstance(resolved, dict):
        raise TypeError(f"classification metadata must resolve to a dict, got {resolved!r}")
    records: list[dict] = []
    for name, item in (resolved.get(settings.items_keyword) or {}).items():
        if item is None:
            continue
        cats = item.get(settings.categories_keyword)
        if cats:
            shared = {k: v for k, v in item.items() if k != settings.categories_keyword}
            rows = []
            for num in sorted(cats):
                row = dict(cats[num]) if cats[num] else {}
                for key, value in shared.items():
                    row.setdefault(key, value)
                rows.append(row)
        else:
            rows = [dict(item)]
        for row in rows:
            row[settings.item_key_name] = str(name).strip("_")
        records.extend(rows)
    resolved[settings.items_keyword] = records
    return resolved
