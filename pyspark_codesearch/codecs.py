"""Delta + varbyte posting-list compression (numpy-vectorized).

Format: classic VByte — each uint encoded little-endian in 7-bit groups,
high bit (0x80) set on every byte EXCEPT the last byte of a value.
Doc-id lists are first delta-encoded (first value absolute, then gaps).

All encode/decode paths are numpy array ops (no per-int python loops beyond
a fixed <=10-iteration shift loop), so they run fast inside Arrow batches
in mapInPandas workers. Mirrors the compression the reference delegates to
Lucene (postings codec) — ours is explicit per BASELINE.json north_rule.
"""

from __future__ import annotations

import numpy as np

_MAX_GROUPS = 10  # 70 bits > uint64


def varbyte_encode(values: np.ndarray | list[int]) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    nbytes = np.ones(n, dtype=np.int64)
    rest = v >> np.uint64(7)
    while rest.any():
        nbytes += (rest > 0).astype(np.int64)
        rest >>= np.uint64(7)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    for g in range(_MAX_GROUPS):
        mask = nbytes > g
        if not mask.any():
            break
        pos = starts[mask] + g
        byte = ((v[mask] >> np.uint64(7 * g)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > g + 1).astype(np.uint8) << 7
        out[pos] = byte | cont
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    term = (b & 0x80) == 0
    # group id for every byte = #terminators strictly before it
    gid = np.zeros(b.size, dtype=np.int64)
    np.cumsum(term[:-1], out=gid[1:])
    starts = np.flatnonzero(np.concatenate(([True], term[:-1])))
    pos = np.arange(b.size, dtype=np.int64) - starts[gid]
    vals = np.zeros(int(term.sum()), dtype=np.uint64)
    np.add.at(vals, gid, (b & np.uint8(0x7F)).astype(np.uint64) << (7 * pos).astype(np.uint64))
    return vals


def varbyte_sizes(values: np.ndarray) -> np.ndarray:
    """#bytes each value needs under VByte (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nbytes = np.ones(v.size, dtype=np.int64)
    rest = v >> np.uint64(7)
    while rest.any():
        nbytes += (rest > 0).astype(np.int64)
        rest >>= np.uint64(7)
    return nbytes


def encode_blocked(ids: np.ndarray, tfs: np.ndarray, block: int):
    """Encode a whole posting run in TWO varbyte passes, then slice per
    block: gaps restart (absolute value) at each block boundary so blocks
    stay independently decodable. Returns (ids_bufs, tfs_bufs) lists.

    One numpy pass per group instead of ~10 numpy calls per 128-doc
    block — the applyInPandas encoder's hot loop.
    """
    n = ids.size
    if n == 0:
        return [], []
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = np.uint64(ids[0])
    if n > 1:
        d = np.diff(ids)
        if (d <= 0).any():
            raise ValueError("doc ids must be strictly increasing")
        gaps[1:] = d.astype(np.uint64)
    starts = np.arange(0, n, block)
    gaps[starts] = ids[starts].astype(np.uint64)  # absolute at block start
    id_buf = varbyte_encode(gaps)
    tf_buf = varbyte_encode(tfs.astype(np.uint64))
    id_off = np.concatenate(([0], np.cumsum(varbyte_sizes(gaps))))
    tf_off = np.concatenate(([0], np.cumsum(varbyte_sizes(tfs.astype(np.uint64)))))
    ids_bufs, tfs_bufs = [], []
    for b0 in starts:
        b1 = min(b0 + block, n)
        ids_bufs.append(id_buf[id_off[b0] : id_off[b1]])
        tfs_bufs.append(tf_buf[tf_off[b0] : tf_off[b1]])
    return ids_bufs, tfs_bufs


def delta_encode(sorted_ids: np.ndarray | list[int]) -> bytes:
    a = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return b""
    gaps = np.empty(a.size, dtype=np.uint64)
    gaps[0] = np.uint64(a[0])
    if a.size > 1:
        d = np.diff(a)
        if (d <= 0).any():
            raise ValueError("doc ids must be strictly increasing")
        gaps[1:] = d.astype(np.uint64)
    return varbyte_encode(gaps)


def delta_decode(buf: bytes) -> np.ndarray:
    gaps = varbyte_decode(buf)
    if gaps.size == 0:
        return np.empty(0, dtype=np.int64)
    return np.cumsum(gaps.astype(np.int64))
