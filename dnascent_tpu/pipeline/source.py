"""Read sources: the host-side record feeding the pipeline.

``ReadRecord`` carries everything ``DNAscent::read`` derives from a BAM
record + raw signal (reference: src/reads.h:178-304): the basecall and the
mapped reference subsequence (both in 5'->3' *sequencing* direction, i.e.
reverse-complemented for reverse-strand reads), CIGAR-derived coordinate
maps, and the raw pA signal.

Concrete sources:
* ``BamPod5Source`` (io/bam.py + io/pod5_io.py) — the production path;
* ``SimulatedSource`` — deterministic synthetic reads for tests/benchmarks.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, Optional

import numpy as np

from ..config import SubstrateConfig, DNA_R10
from ..testing.simulate import simulate_read
from ..utils.seqtools import reverse_complement


@dataclass
class ReadRecord:
    read_id: str
    contig: str
    ref_start: int
    ref_end: int
    is_reverse: bool
    basecall: str                 # 5'->3' sequencing direction
    reference_seq: str            # mapped ref subsequence, same orientation
    ref_to_query: np.ndarray      # (refLen,) int64 (reads.h:192; htsInterface.cpp:59)
    query_to_ref: np.ndarray      # (queryLen,) int64, -1 where unmapped
    ref_to_del: np.ndarray        # (refLen,) bool
    raw: np.ndarray               # (S,) float64 pA
    mapping_quality: int = 60

    @property
    def strand(self) -> str:
        return "rev" if self.is_reverse else "fwd"

    @property
    def ref_span(self) -> int:
        return self.ref_end - self.ref_start


class SimulatedSource:
    """Yields error-free simulated reads (query == reference, identity maps).

    ``analogue_spans`` optionally paints BrdU/EdU tracks onto subranges to
    exercise detect/forkSense end-to-end.
    """

    def __init__(self, models, cfg: SubstrateConfig = DNA_R10, n_reads: int = 8,
                 length: int = 5000, seed: int = 0, contig: str = "chrSim",
                 analogue_painter=None):
        self.models = models
        self.cfg = cfg
        self.n_reads = n_reads
        self.length = length
        self.seed = seed
        self.contig = contig
        self.analogue_painter = analogue_painter

    def __iter__(self) -> Iterator[ReadRecord]:
        for i in range(self.n_reads):
            seed = self.seed + i
            mask = None
            if self.analogue_painter is not None:
                mask = self.analogue_painter(seed, self.length)
            sim = simulate_read(self.models.pore_model, self.cfg,
                                length=self.length, seed=seed,
                                analogue_model=self.models.analogue_model,
                                analogue_mask=mask)
            L = len(sim.sequence)
            idx = np.arange(L, dtype=np.int64)
            yield ReadRecord(
                read_id=sim.read_id,
                contig=self.contig,
                ref_start=1000 + 10 * i,
                ref_end=1000 + 10 * i + L,
                is_reverse=False,
                basecall=sim.sequence,
                reference_seq=sim.sequence,
                ref_to_query=idx.copy(),
                query_to_ref=idx.copy(),
                ref_to_del=np.zeros(L, dtype=bool),
                raw=sim.raw,
            )
