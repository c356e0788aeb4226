"""Deterministic merge of per-host pipeline outputs.

The reference is single-process, so output order is BAM record order
(SURVEY §5).  In the multi-host TPU deployment each host writes its shard's
results to ``<out>.host<k>``; this module merges them into one file in a
canonical order — (contig, refStart, refEnd, readID) — so results are
byte-stable regardless of host count or scheduling.
"""

from __future__ import annotations

import os
from typing import Iterator


def _read_blocks(path: str):
    """Split a detect/forkSense/align-style file into (sort_key, text
    block) per read, passing through the header."""
    header_lines = []
    blocks = []
    cur_key = None
    cur: list[str] = []
    with open(path) as fh:
        for line in fh:
            if line.startswith("#"):
                header_lines.append(line)
                continue
            if line.startswith(">"):
                if cur_key is not None:
                    blocks.append((cur_key, "".join(cur)))
                fields = line[1:].split()
                # (contig, refStart, refEnd, readID)
                cur_key = (fields[1], int(fields[2]), int(fields[3]),
                           fields[0])
                cur = [line]
            elif cur_key is not None:
                cur.append(line)
    if cur_key is not None:
        blocks.append((cur_key, "".join(cur)))
    return "".join(header_lines), blocks


def merge_host_outputs(shard_paths: list[str], output_path: str) -> int:
    """Merge per-host human-readable outputs deterministically.  Returns the
    number of reads written."""
    all_blocks = []
    header = ""
    for p in sorted(shard_paths):
        h, blocks = _read_blocks(p)
        if h and not header:
            header = h
        all_blocks.extend(blocks)
    all_blocks.sort(key=lambda kb: kb[0])
    with open(output_path, "w") as out:
        out.write(header)
        for _, text in all_blocks:
            out.write(text)
    return len(all_blocks)


def merge_bed_outputs(shard_paths: list[str], output_path: str) -> int:
    """Merge per-host bed files: header from the first shard, rows sorted by
    (contig, start, end, readID)."""
    header_lines: list[str] = []
    rows = []
    for p in sorted(shard_paths):
        with open(p) as fh:
            for line in fh:
                if line.startswith("#"):
                    if p == sorted(shard_paths)[0]:
                        header_lines.append(line)
                    continue
                cols = line.split()
                if len(cols) >= 4:
                    rows.append(((cols[0], int(cols[1]), int(cols[2]),
                                  cols[3]), line))
    rows.sort(key=lambda r: r[0])
    with open(output_path, "w") as out:
        out.writelines(header_lines)
        for _, line in rows:
            out.write(line)
    return len(rows)


def host_shard_path(output_path: str, process_index: int) -> str:
    return f"{output_path}.host{process_index}"
