"""Import the reference PyTorch scripts for parity testing.

The reference files import torchvision (absent in this image); we stub the
handful of symbols they touch at import time. Importing executes only class
definitions (their __main__ blocks are guarded). The reference tree is
treated as read-only test fixture — nothing from it is copied into the
package.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REFERENCE_DIR = "/root/reference"


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    for sub in ("models", "transforms", "utils", "datasets"):
        m = types.ModuleType(f"torchvision.{sub}")
        setattr(tv, sub, m)
        sys.modules[f"torchvision.{sub}"] = m
    sys.modules["torchvision.utils"].save_image = lambda *a, **k: None
    sys.modules["torchvision.utils"].make_grid = lambda *a, **k: None
    sys.modules["torchvision.datasets"].MNIST = object
    sys.modules["torchvision"] = tv


def load_reference_module(name: str):
    """Load e.g. 'new_scripy' or 'MNIST_script' from /root/reference."""
    path = os.path.join(REFERENCE_DIR, f"{name}.py")
    if not os.path.exists(path):
        return None
    _stub_torchvision()
    modname = f"_reference_{name}"
    if modname in sys.modules:
        return sys.modules[modname]
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod
