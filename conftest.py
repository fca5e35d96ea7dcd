"""Root conftest: make `src/` importable. No jax imports here."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "src"))
