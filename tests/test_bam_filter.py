"""Tests for the pure-Python BAM layer and filter_sam_by_target_base."""

import struct
from pathlib import Path

from .util import run_cli

SEQ_NIBBLE = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}
CIGAR_OP = {c: i for i, c in enumerate("MIDNSHP=X")}


def encode_record(ref_id, pos, name, seq, cigar, flag=0, mapq=60):
    name_b = name.encode() + b"\x00"
    cigar_b = b"".join(struct.pack("<I", (ln << 4) | CIGAR_OP[op])
                       for op, ln in cigar)
    seq_b = bytearray()
    for i in range(0, len(seq), 2):
        hi = SEQ_NIBBLE[seq[i]] << 4
        lo = SEQ_NIBBLE[seq[i + 1]] if i + 1 < len(seq) else 0
        seq_b.append(hi | lo)
    qual_b = bytes([30] * len(seq))
    body = struct.pack("<iiBBHHHiiii", ref_id, pos, len(name_b), mapq, 0,
                       len(cigar), flag, len(seq), -1, -1, 0)
    raw = body + name_b + cigar_b + bytes(seq_b) + qual_b
    return struct.pack("<i", len(raw)) + raw


def write_bam(path, refs, records):
    from genomics_general_tpu.io.bam import BGZF_EOF, bgzf_compress
    header_text = "".join(f"@SQ\tSN:{n}\tLN:{l}\n" for n, l in refs)
    payload = b"BAM\x01" + struct.pack("<i", len(header_text)) + \
        header_text.encode() + struct.pack("<i", len(refs))
    for n, l in refs:
        payload += struct.pack("<i", len(n) + 1) + n.encode() + b"\x00" + \
            struct.pack("<i", l)
    for r in records:
        payload += r
    with open(path, "wb") as f:
        f.write(bgzf_compress(payload))
        f.write(BGZF_EOF)


def test_bam_roundtrip_and_filter(tmp_path):
    from genomics_general_tpu.io.bam import BamReader
    refs = [("chrA", 10000), ("chrB", 5000)]
    # read r1 has A at chrA:101 (0-based 100); r2 has G there; r3 has a
    # deletion spanning it; r4 maps to chrB. r1's mate also present.
    records = [
        encode_record(0, 95, "r1", "TTTTTAGGGG", [("M", 10)]),
        encode_record(0, 95, "r2", "TTTTTGGGGG", [("M", 10)]),
        encode_record(0, 95, "r3", "TTTTTGGGG", [("M", 4), ("D", 2),
                                                 ("M", 5)]),
        encode_record(1, 200, "r4", "ACGTACGTAC", [("M", 10)]),
        encode_record(0, 500, "r1", "CCCCCCCCCC", [("M", 10)]),
    ]
    bam = str(tmp_path / "in.bam")
    write_bam(bam, refs, records)

    reader = BamReader(bam)
    assert reader.ref_names == ["chrA", "chrB"]
    recs = list(reader.records())
    assert [r.read_name for r in recs] == ["r1", "r2", "r3", "r4", "r1"]
    assert recs[0].seq == "TTTTTAGGGG"
    # aligned pairs of the deletion read skip the deleted reference bases
    pairs = dict((r, q) for q, r in recs[2].aligned_pairs()
                 if r is not None)
    assert pairs[95] == 0 and pairs[99] is None and pairs[100] is None

    targets = tmp_path / "targets.txt"
    targets.write_text("chrA\t101\tA\n")
    out = str(tmp_path / "out.bam")
    run_cli("genomics_general_tpu.cli.filter_sam_by_target_base",
            ["-i", bam, "-o", out, "-t", str(targets), "--pure"])
    got = list(BamReader(out).records())
    # both r1 records (the read and its other segment), nothing else
    assert [r.read_name for r in got] == ["r1", "r1"]
    assert got[0].pos == 95 and got[1].pos == 500
