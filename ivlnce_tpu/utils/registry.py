"""Global registry for trainers, policies, envs, datasets, sensors, measures.

Replaces habitat's registry + habitat_baselines' baseline_registry (the
reference registers components by decorator side effects at import time,
reference: ivlnce_baselines/__init__.py, habitat_extensions/__init__.py).
"""

from __future__ import annotations

import collections
from typing import Any, Callable, DefaultDict, Dict, Optional, Type


class Registry:
    _mapping: DefaultDict[str, Dict[str, Any]] = collections.defaultdict(dict)

    @classmethod
    def _register_impl(
        cls,
        kind: str,
        to_register: Optional[Any],
        name: Optional[str],
        assert_type: Optional[Type] = None,
    ) -> Callable:
        def wrap(to_register):
            register_name = name if name is not None else to_register.__name__
            cls._mapping[kind][register_name] = to_register
            return to_register

        if to_register is None:
            return wrap
        return wrap(to_register)

    @classmethod
    def _get_impl(cls, kind: str, name: str) -> Any:
        value = cls._mapping[kind].get(name)
        if value is None:
            raise KeyError(
                f"No {kind} registered under name '{name}'. "
                f"Available: {sorted(cls._mapping[kind])}"
            )
        return value

    # -- trainers ------------------------------------------------------------
    @classmethod
    def register_trainer(cls, to_register=None, *, name=None):
        return cls._register_impl("trainer", to_register, name)

    @classmethod
    def get_trainer(cls, name: str):
        return cls._get_impl("trainer", name)

    # -- policies -------------------------------------------------------------
    @classmethod
    def register_policy(cls, to_register=None, *, name=None):
        return cls._register_impl("policy", to_register, name)

    @classmethod
    def get_policy(cls, name: str):
        return cls._get_impl("policy", name)

    # -- environments ----------------------------------------------------------
    @classmethod
    def register_env(cls, to_register=None, *, name=None):
        return cls._register_impl("env", to_register, name)

    @classmethod
    def get_env(cls, name: str):
        return cls._get_impl("env", name)

    # -- datasets ---------------------------------------------------------------
    @classmethod
    def register_dataset(cls, to_register=None, *, name=None):
        return cls._register_impl("dataset", to_register, name)

    @classmethod
    def get_dataset(cls, name: str):
        return cls._get_impl("dataset", name)

    # -- sensors ------------------------------------------------------------------
    @classmethod
    def register_sensor(cls, to_register=None, *, name=None):
        return cls._register_impl("sensor", to_register, name)

    @classmethod
    def get_sensor(cls, name: str):
        return cls._get_impl("sensor", name)

    # -- measures --------------------------------------------------------------
    @classmethod
    def register_measure(cls, to_register=None, *, name=None):
        return cls._register_impl("measure", to_register, name)

    @classmethod
    def get_measure(cls, name: str):
        return cls._get_impl("measure", name)

    # -- obs transforms -----------------------------------------------------------
    @classmethod
    def register_obs_transformer(cls, to_register=None, *, name=None):
        return cls._register_impl("obs_transformer", to_register, name)

    @classmethod
    def get_obs_transformer(cls, name: str):
        return cls._get_impl("obs_transformer", name)

    # -- simulators -----------------------------------------------------------
    @classmethod
    def register_simulator(cls, to_register=None, *, name=None):
        return cls._register_impl("simulator", to_register, name)

    @classmethod
    def get_simulator(cls, name: str):
        return cls._get_impl("simulator", name)


registry = Registry()
