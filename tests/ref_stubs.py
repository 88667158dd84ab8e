"""Scoped importer for the read-only torch reference tree.

The reference imports timm / torchvision / omegaconf (absent or partially
absent in this env) and lives in top-level packages named ``models`` and
``datasets``.  The golden-parity tests used to stub those straight into
``sys.modules`` and leave them there — which silently breaks OTHER
libraries' feature probes for the rest of the pytest process: transformers
calls ``importlib.util.find_spec("datasets")`` during model loading and a
spec-less stub module raises ``ValueError: datasets.__spec__ is None``
(this broke the DINOv2 oracle tests whenever a reference-parity module ran
first).

``load(*names)`` installs the stubs, imports the requested reference
modules, then removes every ``sys.modules`` entry it added.  The imported
modules keep their own references to whatever they imported, so they stay
fully functional; only the process-global namespace is restored.
"""

import importlib
import os
import sys
import types

REF = "/root/reference"

# Union of the third-party surface the reference model/dataset modules
# touch at import time.  Installed only when the real library is absent
# from sys.modules, and removed again after the import.
_STUBS = (
    ("timm", {"create_model": lambda *a, **k: None}),
    ("timm.models", {"ConvNeXt": type("ConvNeXt", (), {})}),
    ("torchvision", {"datasets": types.SimpleNamespace(),
                     "utils": types.SimpleNamespace()}),
    ("torchvision.transforms", {"transforms": types.SimpleNamespace()}),
    ("omegaconf", {"MISSING": "???", "OmegaConf": type("OmegaConf", (), {})}),
)


def load(*names):
    """Import reference modules by dotted name (e.g. ``models.dichavit``).

    Returns the module for a single name, else a tuple in call order.
    The ``models``/``datasets`` package anchors are registered with a
    ``__path__`` but WITHOUT running the reference ``__init__`` (which
    imports timm unconditionally).
    """
    if REF not in sys.path:
        sys.path.insert(0, REF)
    added = []
    for stub_name, attrs in _STUBS:
        if stub_name not in sys.modules:
            mod = types.ModuleType(stub_name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[stub_name] = mod
            added.append(stub_name)
    for pkg in ("models", "datasets"):
        if pkg not in sys.modules:
            mod = types.ModuleType(pkg)
            mod.__path__ = [os.path.join(REF, pkg)]
            sys.modules[pkg] = mod
            added.append(pkg)
    try:
        mods = tuple(importlib.import_module(n) for n in names)
    finally:
        for name in added:
            sys.modules.pop(name, None)
    return mods[0] if len(mods) == 1 else mods
