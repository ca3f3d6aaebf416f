"""tokrle — Ray-Data-native RLE / lightweight-compression engine.

Package-root API parity with the reference (pyrle/__init__.py:1-29):
``Rle``, ``RleDict``, the ``PyRles`` alias, ``from_csv`` and
``__version__`` are importable from the package root so a migrating
pyrle user's ``from pyrle import Rle, PyRles`` becomes
``from tokrle import Rle, PyRles`` unchanged.
"""

from tokrle.rle import Rle
from tokrle.rledict import RleDict, from_csv

__version__ = "0.1.0"

PyRles = RleDict

__all__ = ["Rle", "RleDict", "PyRles", "from_csv", "__version__"]
