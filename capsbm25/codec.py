"""Delta + LEB128-varint codec for posting lists, fully numpy-vectorized.

Plays the role the LCP array plays in the reference: redundant metadata
derived from sortedness that makes downstream merging/scanning cheap
(SURVEY.md §1.3; /root/reference/include/Suffix_Array.hpp:32). A sorted
doc_id list is stored as varint-encoded first-order gaps; tf/dl lists as
plain varints. Encoding is LEB128: 7 payload bits per byte, MSB = 1 means
"continue".

All hot paths are numpy array ops (no per-element Python loops), so the
same code runs inside Arrow-batched Spark kernels at full speed.
"""

from __future__ import annotations

import numpy as np

_THRESH = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def _encode_core(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode; returns (byte buffer, per-value end offsets)."""
    v = np.asarray(values).astype(np.uint64, copy=False)
    if v.size == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    # bytes needed per value: 1 + number of 7-bit thresholds crossed
    nbytes = np.ones(v.size, dtype=np.int64)
    for t in _THRESH:
        nbytes += (v >= t).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    work = v.copy()
    for j in range(10):
        sel = nbytes > j
        if not sel.any():
            break
        idx = starts[sel] + j
        byte = (work[sel] & np.uint64(0x7F)).astype(np.uint8)
        more = (j + 1) < nbytes[sel]
        out[idx] = byte | (more.astype(np.uint8) << np.uint8(7))
        work[sel] >>= np.uint64(7)
    return out, ends


def encode_varints(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative int64/uint64 values."""
    out, _ = _encode_core(values)
    return out.tobytes()


def encode_varints_grouped(
    values: np.ndarray, group_starts: np.ndarray
) -> list[bytes]:
    """Encode many concatenated value groups in ONE vectorized pass and
    return each group's bytes. Equivalent to
    ``[encode_varints(g) for g in groups]`` (varints are independent per
    value) but amortizes the numpy call overhead across thousands of
    small posting runs — the hot path of map-side run packing."""
    out, ends = _encode_core(values)
    gs = np.asarray(group_starts, dtype=np.int64)
    if ends.size == 0:
        return [b""] * gs.size
    byte_bounds = np.empty(gs.size + 1, dtype=np.int64)
    byte_bounds[0] = 0
    if gs.size > 1:
        # byte offset where group i starts = end of the previous VALUE;
        # a leading empty group (gs[i] == 0) starts at byte 0, not at
        # ends[-1] (negative indexing would wrap to the buffer end)
        byte_bounds[1:-1] = np.where(
            gs[1:] > 0, ends[np.maximum(gs[1:] - 1, 0)], 0
        )
    byte_bounds[-1] = ends[-1] if ends.size else 0
    raw = out.tobytes()
    return [raw[byte_bounds[i]:byte_bounds[i + 1]] for i in range(gs.size)]


def decode_varints(buf: bytes) -> np.ndarray:
    """Decode a LEB128 byte string into a uint64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.zeros(0, dtype=np.uint64)
    if int(raw.max()) < 0x80:
        # every byte is a complete single-byte value — the common case
        # for gap/tf streams (values < 128): one reduction + one cast
        # instead of the ~12 array passes of the general path below
        # (measured ~5x on 9M-value hot-term streams)
        return raw.astype(np.uint64)
    is_last = (raw & 0x80) == 0
    if not is_last[-1]:
        # final byte still has the continuation bit set: the buffer ends
        # mid-varint. Silently decoding fewer values would mask
        # truncation/corruption — fail loudly instead.
        raise ValueError("truncated varint buffer (incomplete final value)")
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    if int(lengths.max()) > 10:
        # a uint64 LEB128 value is at most 10 bytes; an 11+-byte varint
        # is corruption, and the shift below would silently WRAP (numpy
        # shifts mod 64) instead of raising — keep the fail-loudly
        # contract the truncation check above establishes
        raise ValueError(
            f"varint longer than 10 bytes ({int(lengths.max())}) — "
            "corrupt posting payload"
        )
    vals = np.zeros(ends.size, dtype=np.uint64)
    for j in range(int(lengths.max())):
        sel = lengths > j
        vals[sel] |= (raw[starts[sel] + j] & np.uint64(0x7F)).astype(
            np.uint64
        ) << np.uint64(7 * j)
    return vals


def sorted_member_mask(sorted_ids: np.ndarray,
                       values: np.ndarray) -> np.ndarray:
    """Boolean mask: values[i] in sorted_ids (sorted, unique). The
    searchsorted+clamp+compare idiom shared by the query doc-filter /
    liveDocs masks and the compaction tombstone drop."""
    if sorted_ids.size == 0 or values.size == 0:
        return np.zeros(values.size, dtype=bool)
    ix = np.searchsorted(sorted_ids, values)
    ix[ix == sorted_ids.size] = sorted_ids.size - 1
    return sorted_ids[ix] == values


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """Encode a strictly-increasing int64 array as varint gaps."""
    a = np.asarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return b""
    gaps = np.empty(a.size, dtype=np.int64)
    gaps[0] = a[0]
    np.subtract(a[1:], a[:-1], out=gaps[1:])
    if a.size > 1 and gaps[1:].min() <= 0:
        raise ValueError("doc_ids must be strictly increasing")
    return encode_varints(gaps)


def delta_decode(buf: bytes) -> np.ndarray:
    """Inverse of delta_encode -> int64 array."""
    gaps = decode_varints(buf).astype(np.int64)
    return np.cumsum(gaps)


def decode_pair_positions(buf: bytes, tfs: np.ndarray) -> np.ndarray:
    """Decode a positions payload: delta+varint-encoded in-document
    token positions with an ABSOLUTE value at every pair start; pair
    sizes are the decoded tfs. Returns the flat absolute positions in
    pair order (inverse of the encoding in postings._posting_rows)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    gaps = decode_varints(buf).astype(np.int64)
    if gaps.size != total:
        raise ValueError(
            f"pos payload corrupt: {gaps.size} values, expected {total}"
        )
    pair_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    c = np.cumsum(gaps)
    prev = np.concatenate(([0], c[pair_starts[1:] - 1]))
    return c - np.repeat(prev, tfs)


def permute_pair_payload(
    pos: np.ndarray, tfs: np.ndarray, order: np.ndarray
) -> np.ndarray:
    """Permute a flat per-pair payload (positions grouped by pair, pair
    sizes = tfs) into the pair order given by ``order``, in one gather —
    the companion of every doc-sort that reorders pairs."""
    tfs = np.asarray(tfs, dtype=np.int64)
    cum = np.concatenate(([0], np.cumsum(tfs)))
    t_new = tfs[order]
    new_pref = np.concatenate(([0], np.cumsum(t_new)[:-1]))
    offs = np.repeat(cum[:-1][order] - new_pref, t_new)
    return pos[np.arange(pos.size) + offs]
