#!/usr/bin/env python3
"""Independent bigWig decoder (stdlib only) used to generate golden TSVs
for the JVM-native reader's tests (fixtures/*_bw_golden.tsv).

Implements the public bigWig spec (Kent et al., Bioinformatics 2010,
supplementary tables: common header, chromosome B+ tree, R-tree index,
zlib-compressed wig data sections). Deliberately shares no code with
src/main/scala/graft/io — it exists to cross-check that reader.

Usage: bigwig_golden.py <in.bw> <out.tsv>
Output: chrom<TAB>start<TAB>end<TAB>value  (value = repr of the float32
widened to double, i.e. the shortest string that round-trips), rows in
(natsorted chrom, block order) to match pyranges read_bigwig row order.
"""
import struct
import sys
import zlib

BIGWIG_MAGIC = 0x888FFC26
CHROM_TREE_MAGIC = 0x78CA8C91
RTREE_MAGIC = 0x2468ACE0


def read_bigwig(path):
    with open(path, "rb") as fh:
        data = fh.read()

    def u(fmt, off):
        return struct.unpack_from("<" + fmt, data, off)

    (magic, version, _zoom, chrom_tree_off, full_data_off, full_index_off,
     _field_count, _defined_fields, _autosql_off, _summary_off,
     uncompress_buf, _reserved) = u("IHHQQQHHQQIQ", 0)
    assert magic == BIGWIG_MAGIC, hex(magic)

    # chromosome B+ tree -> {chromId: name}
    (cmagic, _bsize, key_size, _val_size, _count, _resv) = u("IIIIQQ", chrom_tree_off)
    assert cmagic == CHROM_TREE_MAGIC
    chroms = {}

    def walk_chrom(off):
        is_leaf, _r, n = u("BBH", off)
        off += 4
        for _ in range(n):
            if is_leaf:
                key = data[off:off + key_size].split(b"\0")[0].decode()
                cid, _size = u("II", off + key_size)
                chroms[cid] = key
                off += key_size + 8
            else:
                (child,) = u("Q", off + key_size)
                walk_chrom(child)
                off += key_size + 8

    walk_chrom(chrom_tree_off + 32)

    # R-tree index -> leaf (dataOffset, dataSize) blocks
    (rmagic, _bs, _items, _sc, _sb, _ec, _eb, _efo, _ips, _rr) = u(
        "IIQIIIIQII", full_index_off)
    assert rmagic == RTREE_MAGIC
    blocks = []

    def walk_rtree(off):
        is_leaf, _r, n = u("BBH", off)
        off += 4
        for _ in range(n):
            if is_leaf:
                _sc, _sb, _ec, _eb, doff, dsize = u("IIIIQQ", off)
                blocks.append((doff, dsize))
                off += 32
            else:
                _sc, _sb, _ec, _eb, child = u("IIIIQ", off)
                walk_rtree(child)
                off += 24

    walk_rtree(full_index_off + 48)

    rows = []
    for doff, dsize in sorted(blocks):
        raw = data[doff:doff + dsize]
        if uncompress_buf > 0:
            raw = zlib.decompress(raw)
        cid, cstart, _cend, step, span, sec_type, _r, n = struct.unpack_from(
            "<IIIIIBBH", raw, 0)
        off = 24
        for i in range(n):
            if sec_type == 1:      # bedGraph
                s, e, v = struct.unpack_from("<IIf", raw, off)
                off += 12
            elif sec_type == 2:    # varStep
                s, v = struct.unpack_from("<If", raw, off)
                e = s + span
                off += 8
            else:                  # fixedStep
                (v,) = struct.unpack_from("<f", raw, off)
                s = cstart + i * step
                e = s + span
                off += 4
            rows.append((chroms[cid], s, e, float(v)))

    def natkey(c):
        return (0, int(c)) if c.isdigit() else (1, c)

    rows.sort(key=lambda r: (natkey(r[0]),))  # stable: block order within chrom
    return rows


if __name__ == "__main__":
    out = open(sys.argv[2], "w")
    for chrom, s, e, v in read_bigwig(sys.argv[1]):
        out.write(f"{chrom}\t{s}\t{e}\t{v!r}\n")
    out.close()
