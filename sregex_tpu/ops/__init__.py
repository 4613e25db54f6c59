"""Device (XLA/Pallas) kernels for sregex-tpu."""

from .scan import dfa_device_tables, chunk_transfer, scan_block, scan_bytes

__all__ = ["dfa_device_tables", "chunk_transfer", "scan_block",
           "scan_bytes"]
