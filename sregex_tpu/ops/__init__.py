"""Device (XLA/Pallas) kernels for sregex-tpu."""

from .scan import dfa_device_tables, chunk_transfer, scan_block, scan_bytes
from .pallas_scan import (SpecTables, SpecTablesWide, spec_scan_bytes,
                          spec_count_bytes, spec_scan_last_bytes,
                          spec_chunk_map)
from .pallas_big import SpecTablesBig
from .prep import prepare_on_device, prepare_auto
from .pipeline import pipelined_count, pipelined_scan

__all__ = ["dfa_device_tables", "chunk_transfer", "scan_block",
           "scan_bytes", "SpecTables", "SpecTablesWide",
           "SpecTablesBig", "spec_scan_bytes", "spec_count_bytes",
           "spec_scan_last_bytes", "spec_chunk_map",
           "prepare_on_device", "prepare_auto",
           "pipelined_count", "pipelined_scan"]
