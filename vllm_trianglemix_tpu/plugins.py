"""Plugin loading (reference vllm/plugins/__init__.py, 257 LoC).

Third-party packages extend the engine by registering setuptools entry
points in the ``vtt.general_plugins`` group (reference group:
``vllm.general_plugins``); each entry point is a zero-arg callable
invoked once at engine construction. Typical uses: registering extra
model architectures (models/registry.py:_REGISTRY is import-time
mutable), adding tool-call wire formats (entrypoints/openai/parsers.py
TOOL_FORMATS), or installing custom KV connectors.

``VTT_PLUGINS`` (comma-separated names) restricts which discovered
plugins load — unset loads all, empty string disables loading
(reference VLLM_PLUGINS semantics).
"""

from __future__ import annotations

import os

from vllm_trianglemix_tpu.logger import init_logger

logger = init_logger(__name__)

PLUGIN_GROUP = "vtt.general_plugins"

_loaded = False


def load_general_plugins() -> dict:
    """Discover and invoke registered plugins once per process. Returns
    {name: entry point value} of the plugins that loaded."""
    global _loaded
    if _loaded:
        return {}
    _loaded = True

    allowed = os.environ.get("VTT_PLUGINS")
    allow_list = (None if allowed is None
                  else {p.strip() for p in allowed.split(",") if p.strip()})

    import importlib.metadata as md

    try:
        eps = md.entry_points(group=PLUGIN_GROUP)
    except TypeError:  # pragma: no cover - pre-3.10 selectable API
        eps = md.entry_points().get(PLUGIN_GROUP, [])

    loaded: dict = {}
    for ep in eps:
        if allow_list is not None and ep.name not in allow_list:
            logger.info("plugin %r skipped (not in VTT_PLUGINS)", ep.name)
            continue
        try:
            fn = ep.load()
            fn()
            loaded[ep.name] = ep.value
            logger.info("loaded plugin %r (%s)", ep.name, ep.value)
        except Exception:  # noqa: BLE001 - a broken plugin must not
            logger.exception("plugin %r failed to load", ep.name)
    return loaded


def reset_for_testing() -> None:
    global _loaded
    _loaded = False
