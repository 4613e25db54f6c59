"""Multi-chip parallel layers for sregex-tpu."""

from .sharded_scan import make_mesh, sharded_scan_bytes
from . import distributed
from . import multihost

__all__ = ["make_mesh", "sharded_scan_bytes", "distributed",
           "multihost"]
