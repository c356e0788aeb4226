"""External-format fixtures: the from-scratch BGZF/BAM and svb16/VBZ codecs
are validated against INDEPENDENT implementations built here directly from
the format specifications (SAM spec §4 for BAM/BGZF; the streamvbyte-16
layout Oxford Nanopore's vbz plugin uses), not against the package's own
writers — guarding against self-consistent drift (a wrong-but-roundtripping
detail would pass writer<->reader tests yet fail on real Dorado output;
reference behaviour: src/htsInterface.cpp:59-157, src/pod5.cpp:57-93)."""

import gzip
import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# Independent BGZF writer (SAM spec section 4.1): gzip members with the
# BC extra subfield carrying BSIZE = total block size - 1
# ---------------------------------------------------------------------------

# the spec's mandated 28-byte EOF marker (SAM spec 4.1.2)
SPEC_BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def bgzf_block(payload: bytes, level: int = 6) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    cdata = co.compress(payload) + co.flush()
    bsize = len(cdata) + 25 + 1  # header(12) + XLEN payload(6) + crc/isize(8)
    header = (b"\x1f\x8b\x08\x04" + b"\x00" * 6 +
              struct.pack("<HccH H", 6, b"B", b"C", 2, bsize - 1))
    footer = struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF,
                         len(payload) & 0xFFFFFFFF)
    return header + cdata + footer


def bam_record_bytes(qname: str, flag: int, ref_id: int, pos: int, mapq: int,
                     cigar: list[tuple[int, int]], seq: str, qual: bytes,
                     tags: bytes = b"") -> bytes:
    """One alignment record per SAM spec section 4.2."""
    name = qname.encode() + b"\x00"
    n_cigar = len(cigar)
    cig = b"".join(struct.pack("<I", (ln << 4) | op) for op, ln in cigar)
    nyb = "=ACMGRSVTWYHKDBN"
    packed = bytearray()
    for i in range(0, len(seq), 2):
        hi = nyb.index(seq[i])
        lo = nyb.index(seq[i + 1]) if i + 1 < len(seq) else 0
        packed.append((hi << 4) | lo)
    # bin: spec reg2bin of [pos, pos+1) — constant 4681 + pos>>14 region is
    # unused by the reader; emit the spec formula for an interval
    end = pos + sum(ln for op, ln in cigar if op in (0, 2, 3, 7, 8))

    def reg2bin(b, e):
        e -= 1
        for shift, off in ((14, 32749), (17, 4093), (20, 509), (23, 61),
                           (26, 8)):
            if b >> shift == e >> shift:
                return off + (b >> shift)
        return 0

    body = struct.pack("<iiBBHHHiiii", ref_id, pos, len(name), mapq,
                       reg2bin(pos, max(end, pos + 1)), n_cigar, flag,
                       len(seq), -1, -1, 0)
    body += name + cig + bytes(packed) + qual + tags
    return struct.pack("<I", len(body)) + body


def build_spec_bam(path: str, refs: list[tuple[str, int]], records) -> None:
    header_text = "@HD\tVN:1.6\n" + "".join(
        f"@SQ\tSN:{n}\tLN:{l}\n" for n, l in refs)
    payload = b"BAM\x01" + struct.pack("<i", len(header_text))
    payload += header_text.encode()
    payload += struct.pack("<i", len(refs))
    for n, l in refs:
        payload += struct.pack("<i", len(n) + 1) + n.encode() + b"\x00"
        payload += struct.pack("<i", l)
    rec_bytes = b"".join(records)
    with open(path, "wb") as fh:
        # split header and records across separate BGZF members (exercises
        # the reader's cross-block record assembly) and append the spec EOF
        fh.write(bgzf_block(payload))
        fh.write(bgzf_block(rec_bytes[: len(rec_bytes) // 2]))
        fh.write(bgzf_block(rec_bytes[len(rec_bytes) // 2 :]))
        fh.write(SPEC_BGZF_EOF)


def test_bam_reader_parses_spec_built_file(tmp_path):
    from dnascent_tpu.io.bam import BamReader

    tags = (b"MQi" + struct.pack("<i", 55) +
            b"XSZ" + b"hello\x00" +
            b"nsi" + struct.pack("<i", 40000) +
            b"tsC" + struct.pack("<B", 10))
    recs = [
        bam_record_bytes("read1", 0, 0, 99, 60,
                         [(4, 2), (0, 6), (1, 2), (0, 2), (2, 3), (0, 2)],
                         "ACGTACGTACGTAC", b"\x28" * 14, tags),
        bam_record_bytes("read2", 16, 1, 5, 13, [(0, 8)],
                         "TTTTAAAA", b"\x1e" * 8),
    ]
    path = str(tmp_path / "spec.bam")
    build_spec_bam(path, [("chr1", 100000), ("chr2", 5000)], recs)

    rd = BamReader(path)
    assert rd.ref_names == ["chr1", "chr2"]
    assert rd.ref_lengths == [100000, 5000]
    assert "@SQ\tSN:chr1\tLN:100000" in rd.header_text
    got = list(rd)
    assert len(got) == 2
    r1, r2 = got
    assert r1.qname == "read1" and r1.pos == 99 and r1.mapq == 60
    assert r1.flag == 0 and not r1.is_reverse and not r1.is_unmapped
    assert r1.seq() == "ACGTACGTACGTAC"
    # cigar decoded as (op, len) rows per the packed <I encoding
    assert [tuple(row) for row in r1.cigar().tolist()] == \
        [(4, 2), (0, 6), (1, 2), (0, 2), (2, 3), (0, 2)]
    assert r1.get_tag("MQ") == 55
    assert r1.get_tag("XS") == "hello"
    assert r1.get_tag("ns") == 40000
    assert r1.get_tag("ts") == 10
    assert r2.qname == "read2" and r2.is_reverse and r2.ref_id == 1
    assert r2.seq() == "TTTTAAAA"
    rd.close()


def test_bam_reader_accepts_and_writer_emits_spec_eof(tmp_path):
    from dnascent_tpu.io.bam import BGZFWriter, _BGZF_EOF

    # the writer's EOF marker must be the spec's exact bytes
    assert _BGZF_EOF == SPEC_BGZF_EOF
    p = str(tmp_path / "eof.bin")
    w = BGZFWriter(p)
    w.write(b"payload")
    w.close()
    assert open(p, "rb").read().endswith(SPEC_BGZF_EOF)
    # and plain gzip can decompress the whole stream (BGZF is valid gzip)
    assert gzip.decompress(open(p, "rb").read()) == b"payload"


def test_bgzf_reader_reads_plain_gzip_tool_output(tmp_path):
    """Our BGZF reader must parse blocks produced by the INDEPENDENT
    builder above (and their 64 KiB payload limit layout)."""
    from dnascent_tpu.io.bam import BGZFReader

    payload = bytes(range(256)) * 300
    p = str(tmp_path / "multi.bgzf")
    with open(p, "wb") as fh:
        for i in range(0, len(payload), 60000):
            fh.write(bgzf_block(payload[i : i + 60000]))
        fh.write(SPEC_BGZF_EOF)
    rd = BGZFReader(p)
    assert rd.read(len(payload)) == payload
    assert rd.read(10) == b""
    rd.close()


# ---------------------------------------------------------------------------
# Independent svb16 (streamvbyte, 16-bit variant) + zigzag-delta: the layout
# ONT's vbz plugin uses — control bits first (1 bit/value: 0 = 1 data byte,
# 1 = 2 data bytes, little-endian within each control byte), then data bytes
# ---------------------------------------------------------------------------

def svb16_encode_independent(values: np.ndarray) -> bytes:
    u = np.asarray(values, dtype=np.uint16)
    n = u.shape[0]
    ctrl = bytearray((n + 7) // 8)
    data = bytearray()
    for i, v in enumerate(u):
        v = int(v)
        if v < 256:
            data.append(v)
        else:
            ctrl[i // 8] |= 1 << (i % 8)
            data += struct.pack("<H", v)
    return bytes(ctrl) + bytes(data)


def zigzag_encode_independent(s: np.ndarray) -> np.ndarray:
    s = s.astype(np.int64)
    return ((s << 1) ^ (s >> 63)).astype(np.uint16)


def test_svb16_cross_implementation():
    from dnascent_tpu.io.pod5_io import svb16_decode, svb16_encode

    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.integers(0, 255, 100), rng.integers(0, 65535, 100),
        np.asarray([0, 1, 255, 256, 65535, 32768])]).astype(np.uint16)
    # our decoder reads the independent encoder's bytes
    blob = svb16_encode_independent(vals)
    np.testing.assert_array_equal(
        svb16_decode(blob, vals.shape[0]).astype(np.uint16), vals)
    # and the independent layout matches our encoder byte for byte
    assert svb16_encode(vals) == blob


def test_vbz_roundtrip_against_independent_layers(tmp_path):
    """Full VBZ: zstd(svb16(zigzag-delta)) — rebuild the blob from the
    independent layer implementations and decode with our codec."""
    import zstandard

    from dnascent_tpu.io.pod5_io import vbz_compress, vbz_decompress

    rng = np.random.default_rng(1)
    samples = rng.integers(-800, 3000, 2048).astype(np.int16)
    deltas = np.diff(samples.astype(np.int64), prepend=np.int64(0))
    blob = zstandard.ZstdCompressor().compress(
        svb16_encode_independent(zigzag_encode_independent(deltas)))
    got = vbz_decompress(blob, samples.shape[0])
    np.testing.assert_array_equal(got.astype(np.int16), samples)
    # our compressor's output decodes through the independent layers too
    ours = vbz_compress(samples)
    raw = zstandard.ZstdDecompressor().decompress(
        ours, max_output_size=1 << 20)
    n = samples.shape[0]
    ctrl_len = (n + 7) // 8
    ctrl, data = raw[:ctrl_len], raw[ctrl_len:]
    out = np.empty(n, np.uint16)
    o = 0
    for i in range(n):
        if ctrl[i // 8] >> (i % 8) & 1:
            out[i] = struct.unpack_from("<H", data, o)[0]
            o += 2
        else:
            out[i] = data[o]
            o += 1
    undelta = np.cumsum(
        ((out.astype(np.int64) >> 1) ^ -(out.astype(np.int64) & 1)))
    np.testing.assert_array_equal(undelta.astype(np.int16), samples)
