"""A minimal yacs-compatible configuration node.

The reference stacks two yacs config trees (experiment config embedding a
task config, reference: ivlnce_baselines/config/default.py:14-212 and
habitat_extensions/config/default.py). yacs is not available in this
environment, so we provide a small, behavior-compatible implementation:

- attribute and item access (``cfg.MODEL.STATE_ENCODER.hidden_size``)
- ``defrost()`` / ``freeze()`` / ``clone()``
- ``merge_from_file(path)`` (YAML) and ``merge_from_list([k, v, ...])``
- new keys are allowed when merging (habitat's Config behavior; the
  reference relies on this, see SURVEY.md section 5 config quirk).
"""

from __future__ import annotations

import copy
import io
from typing import Any, Dict, List, Optional

import yaml


class ConfigNode(dict):
    """Hierarchical config with attribute access and freezing."""

    _IMMUTABLE = "__immutable__"

    def __init__(self, init_dict: Optional[Dict] = None):
        super().__init__()
        object.__setattr__(self, ConfigNode._IMMUTABLE, False)
        if init_dict:
            for k, v in init_dict.items():
                self[k] = self._to_node(v)

    @classmethod
    def _to_node(cls, value: Any) -> Any:
        if isinstance(value, dict) and not isinstance(value, ConfigNode):
            return cls(value)
        if isinstance(value, (list, tuple)):
            return type(value)(cls._to_node(v) for v in value)
        return value

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, ConfigNode._IMMUTABLE):
            raise AttributeError(
                f"Attempted to set {name} on an immutable ConfigNode. "
                "Call defrost() first."
            )
        self[name] = self._to_node(value)

    def __setitem__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, ConfigNode._IMMUTABLE):
            raise AttributeError(
                f"Attempted to set {name} on an immutable ConfigNode. "
                "Call defrost() first."
            )
        super().__setitem__(name, self._to_node(value))

    def __delattr__(self, name: str) -> None:
        if object.__getattribute__(self, ConfigNode._IMMUTABLE):
            raise AttributeError("Cannot delete from an immutable ConfigNode.")
        del self[name]

    # -- freeze protocol -----------------------------------------------------
    def is_frozen(self) -> bool:
        return object.__getattribute__(self, ConfigNode._IMMUTABLE)

    def freeze(self) -> "ConfigNode":
        self._set_immutable(True)
        return self

    def defrost(self) -> "ConfigNode":
        self._set_immutable(False)
        return self

    def _set_immutable(self, flag: bool) -> None:
        object.__setattr__(self, ConfigNode._IMMUTABLE, flag)
        for v in self.values():
            if isinstance(v, ConfigNode):
                v._set_immutable(flag)

    def clone(self) -> "ConfigNode":
        out = copy.deepcopy(self)
        out._set_immutable(False)
        return out

    def __deepcopy__(self, memo):
        out = ConfigNode()
        memo[id(self)] = out
        for k, v in self.items():
            dict.__setitem__(out, k, copy.deepcopy(v, memo))
        return out

    def __reduce__(self):
        return (ConfigNode, (dict(self),))

    # -- merging ---------------------------------------------------------------
    def merge_from_other_cfg(self, other: "ConfigNode") -> None:
        self._merge_dict(other)

    def _merge_dict(self, other: Dict) -> None:
        frozen = self.is_frozen()
        if frozen:
            self.defrost()
        for k, v in other.items():
            if (
                k in self
                and isinstance(self[k], ConfigNode)
                and isinstance(v, dict)
            ):
                self[k]._merge_dict(v)
            else:
                self[k] = self._to_node(
                    copy.deepcopy(dict(v))
                    if isinstance(v, ConfigNode)
                    else copy.deepcopy(v)
                )
        if frozen:
            self.freeze()

    def merge_from_file(self, path: str) -> None:
        with open(path, "r") as f:
            loaded = yaml.safe_load(f)
        if loaded:
            self._merge_dict(loaded)

    def merge_from_str(self, text: str) -> None:
        loaded = yaml.safe_load(io.StringIO(text))
        if loaded:
            self._merge_dict(loaded)

    def merge_from_list(self, opts: List[Any]) -> None:
        assert len(opts) % 2 == 0, (
            f"Override list has odd length: {opts}; it must be [key, value] "
            "pairs"
        )
        # defrost unconditionally (recursive): subtrees assigned from an
        # already-frozen config (get_config's TASK_CONFIG rebuild) stay
        # frozen even while the root is mutable, and CLI opts must be able
        # to override nested TASK_CONFIG.* keys (reference run.py:61-66)
        frozen = self.is_frozen()
        self.defrost()
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = str(key).split(".")
            for p in parts[:-1]:
                if p not in node:
                    node[p] = ConfigNode()
                node = node[p]
            node[parts[-1]] = _decode_value(value, node.get(parts[-1]))
        if frozen:
            self.freeze()

    # -- misc -------------------------------------------------------------------
    def to_dict(self) -> Dict:
        out = {}
        for k, v in self.items():
            if isinstance(v, ConfigNode):
                out[k] = v.to_dict()
            elif isinstance(v, (list, tuple)):
                out[k] = [
                    x.to_dict() if isinstance(x, ConfigNode) else x for x in v
                ]
            else:
                out[k] = v
        return out

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def __str__(self) -> str:
        return self.dump()

    def __repr__(self) -> str:
        return f"ConfigNode({dict.__repr__(self)})"


def _decode_value(value: Any, old: Any = None) -> Any:
    """Interpret a CLI override string like yacs does: literal_eval first
    (so "1e-3" parses as a float — YAML 1.1 would keep it a string), then
    YAML as fallback for lists/dicts/bools."""
    if not isinstance(value, str):
        return ConfigNode._to_node(value)
    import ast

    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        pass
    try:
        parsed = yaml.safe_load(value)
    except yaml.YAMLError:
        return value
    if isinstance(parsed, dict):
        return ConfigNode(parsed)
    return parsed


CN = ConfigNode
