"""dnascent_tpu — a TPU-native nanopore base-analogue detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
MBoemo/DNAscent v4.1.1: BrdU/EdU detection in Oxford Nanopore R10.4.1 reads,
replication fork / origin / termination / stall calling, and DNA break
frequency analysis — built for TPU hardware (batched padded kernels, SPMD
over device meshes) rather than per-read CPU threads.

Subcommand parity with the reference binary:

    index | detect | align | forkSense | seeBreaks | trainCNN | trainGMM

See ``dnascent_tpu.cli`` (or the ``dnascent-tpu`` console entry point).
"""

__version__ = "0.1.0"

import os as _os

if not _os.environ.get("DNASCENT_TPU_NO_CACHE"):
    # kernel compiles through remote-compile tunnels cost minutes; the
    # persistent cache pays that once per kernel per machine
    from .utils.jaxcache import enable_compilation_cache as _ecc

    _ecc()

from .config import DNA_R10, SubstrateConfig, get_config  # noqa: F401
