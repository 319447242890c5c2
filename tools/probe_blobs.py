#!/usr/bin/env python3
"""Independent (pure-Python) prober for the graft filter blob wire formats.

This is a from-scratch reimplementation of the PROBE side of every blob
format the library's SQL functions emit, written against the documented
formats (which themselves replicate the reference extension's vendor
formats):

  quotient  40-byte header [u8 q][u8 r][u8 elem_bits][u8 pad][u32 entries]
            [u64 index_mask][u64 rmask][u64 elem_mask][u64 max_size] +
            packed (r+3)-bit slots, little-endian bit order
  xor8/16   [u64 seed][u64 blockLength][fp array]
  fuse8/16  [u64 Seed][u32 Size][u32 SegmentLength][u32 SegmentCount]
            [u32 SegmentCountLength][u32 ArrayLength][fp array]
  bloom     [u64 num_sectors][u64 * num_sectors]

Driven by BlobInteropSpec: the Scala side builds blobs THROUGH THE SQL
FUNCTIONS, dumps them plus member/non-member hash sets, and this script
verifies (1) every member hash is found — cross-implementation
no-false-negatives — and (2) the false-positive rate is within each
family's design bound. It also BUILDS a DuckDB-style bloom from the member
hashes independently and byte-compares it with the Spark-built blob
(the bloom build is order-insensitive, so byte equality must hold).

Exit 0 iff everything passes; prints one summary line per family.
"""
import json
import os
import struct
import sys

M64 = (1 << 64) - 1


def murmur64(h):
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & M64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & M64
    h ^= h >> 33
    return h


def mixsplit(key, seed):
    return murmur64((key + seed) & M64)


def rotl64(n, c):
    return ((n << c) | (n >> (64 - c))) & M64


def reduce32(h32, n):
    return (h32 * n) >> 32


def fingerprint64(h):
    return h ^ (h >> 32)


def probe_xor(blob, key, bits):
    seed, block_len = struct.unpack_from("<QQ", blob, 0)
    h = mixsplit(key, seed)
    h0 = reduce32(h & 0xFFFFFFFF, block_len)
    h1 = reduce32(rotl64(h, 21) & 0xFFFFFFFF, block_len) + block_len
    h2 = reduce32(rotl64(h, 42) & 0xFFFFFFFF, block_len) + 2 * block_len
    if bits == 8:
        f = fingerprint64(h) & 0xFF
        return f == blob[16 + h0] ^ blob[16 + h1] ^ blob[16 + h2]
    f = fingerprint64(h) & 0xFFFF
    u16 = lambda i: struct.unpack_from("<H", blob, 16 + 2 * i)[0]
    return f == u16(h0) ^ u16(h1) ^ u16(h2)


def probe_fuse(blob, key, bits):
    seed, size, seg_len, seg_cnt, seg_cnt_len, arr_len = struct.unpack_from(
        "<QIIIII", blob, 0)
    seg_mask = seg_len - 1
    h = mixsplit(key, seed)
    fp_mask = 0xFF if bits == 8 else 0xFFFF
    f = fingerprint64(h) & fp_mask
    h0 = (h * seg_cnt_len) >> 64
    h1 = h0 + seg_len
    h2 = h1 + seg_len
    h1 ^= (h >> 18) & seg_mask
    h2 ^= h & seg_mask
    if bits == 8:
        g = blob[28 + h0] ^ blob[28 + h1] ^ blob[28 + h2]
    else:
        u16 = lambda i: struct.unpack_from("<H", blob, 28 + 2 * i)[0]
        g = u16(h0) ^ u16(h1) ^ u16(h2)
    return (f ^ g) & fp_mask == 0


def probe_quotient(blob, h):
    q, r = blob[0], blob[1]
    elem_bits = r + 3
    index_mask = (1 << q) - 1
    r_mask = (1 << r) - 1
    elem_mask = (1 << elem_bits) - 1
    table = int.from_bytes(blob[40:], "little")

    def elem(idx):
        return (table >> (elem_bits * idx)) & elem_mask

    occupied = lambda e: e & 1
    continuation = lambda e: e & 2
    shifted = lambda e: e & 4

    fq = (h >> r) & index_mask
    fr = h & r_mask
    if not occupied(elem(fq)):
        return False
    b = fq
    while shifted(elem(b)):
        b = (b - 1) & index_mask
    s = b
    while b != fq:
        while True:
            s = (s + 1) & index_mask
            if not continuation(elem(s)):
                break
        while True:
            b = (b + 1) & index_mask
            if occupied(elem(b)):
                break
    while True:
        rem = elem(s) >> 3
        if rem == fr:
            return True
        if rem > fr:  # hashes are < 2^(q+r) here, plain compare is unsigned-safe
            return False
        s = (s + 1) & index_mask
        if not continuation(elem(s)):
            return False


def bloom_mask(h):
    m = 0
    for byte_idx in range(4, 8):
        m |= 1 << ((h >> (byte_idx * 8)) & 0x3F)
    return m


def probe_bloom(blob, h):
    n = struct.unpack_from("<Q", blob, 0)[0]
    mask = bloom_mask(h)
    sector = struct.unpack_from("<Q", blob, 8 + 8 * (h & (n - 1)))[0]
    return sector & mask == mask


def build_bloom(hashes, num_sectors):
    sectors = [0] * num_sectors
    for h in hashes:
        sectors[h & (num_sectors - 1)] |= bloom_mask(h)
    return struct.pack("<Q", num_sectors) + b"".join(
        struct.pack("<Q", s) for s in sectors)


def read_hashes(path):
    raw = open(path, "rb").read()
    return [x & M64 for (x,) in struct.iter_unpack("<q", raw)]


def main(d):
    members = read_hashes(os.path.join(d, "members.hashes"))
    nonmembers = read_hashes(os.path.join(d, "nonmembers.hashes"))
    probes = {
        "quotient": probe_quotient,
        "xor8": lambda b, h: probe_xor(b, h, 8),
        "xor16": lambda b, h: probe_xor(b, h, 16),
        "fuse8": lambda b, h: probe_fuse(b, h, 8),
        "fuse16": lambda b, h: probe_fuse(b, h, 16),
        "bloom": probe_bloom,
    }
    fpr_bound = {"quotient": 0.01, "xor8": 0.01, "xor16": 0.0005,
                 "fuse8": 0.01, "fuse16": 0.0005, "bloom": 0.005}
    failures = []
    for fam, probe in probes.items():
        blob = open(os.path.join(d, fam + ".blob"), "rb").read()
        found = sum(1 for h in members if probe(blob, h))
        fps = sum(1 for h in nonmembers if probe(blob, h))
        fpr = fps / len(nonmembers)
        ok = found == len(members) and fpr <= fpr_bound[fam]
        print(f"{fam}: members {found}/{len(members)} "
              f"fps {fps}/{len(nonmembers)} (fpr {fpr:.5f}) "
              f"{'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append(fam)

    # reverse direction: build the bloom independently and byte-compare
    spark_bloom = open(os.path.join(d, "bloom.blob"), "rb").read()
    num_sectors = struct.unpack_from("<Q", spark_bloom, 0)[0]
    py_bloom = build_bloom(members, num_sectors)
    eq = py_bloom == spark_bloom
    print(f"bloom-rebuild: byte_equal={eq} ({len(py_bloom)} bytes)")
    if not eq:
        failures.append("bloom-rebuild")
    with open(os.path.join(d, "pybloom.blob"), "wb") as f:
        f.write(py_bloom)

    print(json.dumps({"failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
