"""Keccak-256 + ENS namehash (SURVEY §2.7 F4; reference
airflow/dags/create_merged.py:807-826).

No keccak library ships in this container (hashlib's sha3_256 is NIST SHA-3,
which pads differently), so this is a small pure-Python Keccak-f[1600] —
the namehash UDF runs over *distinct* curated labels only (Opt-6
distinct→compute→join), so the Python cost is bounded by unique-label count
(~2.1M in the reference corpus), not member count (21M).
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1

_RC = (
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
)

_ROT = (
    (0, 36, 3, 41, 18),
    (1, 44, 10, 45, 2),
    (62, 6, 43, 15, 61),
    (28, 55, 25, 21, 56),
    (27, 20, 39, 8, 14),
)


def _rol(v: int, n: int) -> int:
    n %= 64
    return ((v << n) | (v >> (64 - n))) & _M64


def _keccak_f(a: list[list[int]]) -> list[list[int]]:
    for rc in _RC:
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        a = [[a[x][y] ^ d[x] for y in range(5)] for x in range(5)]
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(a[x][y], _ROT[x][y])
        a = [
            [b[x][y] ^ ((~b[(x + 1) % 5][y] & _M64) & b[(x + 2) % 5][y]) for y in range(5)]
            for x in range(5)
        ]
        a[0][0] ^= rc
    return a


def keccak256(data: bytes) -> bytes:
    rate = 136  # 1088-bit rate for 256-bit output
    padlen = rate - (len(data) % rate)
    if padlen == 1:
        padded = data + b"\x81"
    else:
        padded = data + b"\x01" + b"\x00" * (padlen - 2) + b"\x80"
    state = [[0] * 5 for _ in range(5)]
    for off in range(0, len(padded), rate):
        block = padded[off : off + rate]
        for i in range(rate // 8):
            lane = int.from_bytes(block[i * 8 : (i + 1) * 8], "little")
            x, y = i % 5, i // 5
            state[x][y] ^= lane
        state = _keccak_f(state)
    out = b""
    for i in range(4):  # 32 bytes = 4 lanes
        x, y = i % 5, i // 5
        out += state[x][y].to_bytes(8, "little")
    return out


EMPTY_NODE = b"\x00" * 32


# ---------------------------------------------------------------------------
# Vectorized batch path: Keccak-f[1600] on a (5, 5, N) uint64 numpy state —
# all N messages permuted simultaneously. The scalar implementation above
# stays as the reference (differential-tested against it) and the fallback
# for multi-block (>135 byte) inputs. ~100× the scalar rate, which turns
# the namehash-over-distinct-labels stage from the pipeline's hottest
# Python into noise (2.1M labels ≈ a minute of one core instead of 90).
# ---------------------------------------------------------------------------

_RATE = 136


def _rol_v(v: "np.ndarray", n: int) -> "np.ndarray":
    if n == 0:
        return v
    return np.left_shift(v, np.uint64(n)) | np.right_shift(v, np.uint64(64 - n))


def _keccak_f_batch(a: "np.ndarray") -> "np.ndarray":
    """In-place-ish Keccak-f[1600] over state a[x, y, :] (uint64)."""
    for rc in _RC:
        c = a[:, 0] ^ a[:, 1] ^ a[:, 2] ^ a[:, 3] ^ a[:, 4]  # (5, N)
        d = np.roll(c, 1, axis=0) ^ _rol_v(np.roll(c, -1, axis=0), 1)
        a = a ^ d[:, None, :]
        b = np.empty_like(a)
        for x in range(5):
            for y in range(5):
                b[y, (2 * x + 3 * y) % 5] = _rol_v(a[x, y], _ROT[x][y])
        a = b ^ (~np.roll(b, -1, axis=0) & np.roll(b, -2, axis=0))
        a[0, 0] ^= np.uint64(rc)
    return a


def keccak256_batch(msgs: list[bytes]) -> list[bytes]:
    """keccak256 of many short messages at once. Messages over one rate
    block (135 bytes) take the scalar path; everything else is absorbed,
    permuted and squeezed as one numpy batch."""
    n = len(msgs)
    if n == 0:
        return []
    out: list[bytes | None] = [None] * n
    idx = [i for i, m in enumerate(msgs) if len(m) < _RATE]
    for i, m in enumerate(msgs):
        if len(m) >= _RATE:
            out[i] = keccak256(m)
    if idx:
        padded = np.zeros((len(idx), _RATE), dtype=np.uint8)
        for j, i in enumerate(idx):
            m = msgs[i]
            padded[j, : len(m)] = np.frombuffer(m, dtype=np.uint8)
            if len(m) == _RATE - 1:
                padded[j, -1] = 0x81
            else:
                padded[j, len(m)] = 0x01
                padded[j, -1] ^= 0x80
        lanes = padded.view("<u8").reshape(len(idx), 17)  # (N, 17)
        state = np.zeros((5, 5, len(idx)), dtype=np.uint64)
        for i_lane in range(17):
            state[i_lane % 5, i_lane // 5] = lanes[:, i_lane]
        state = _keccak_f_batch(state)
        digest = np.stack(
            [state[i % 5, i // 5] for i in range(4)], axis=1
        ).astype("<u8")  # (N, 4) lanes little-endian
        raw = digest.tobytes()
        for j, i in enumerate(idx):
            out[i] = raw[j * 32 : (j + 1) * 32]
    return out  # type: ignore[return-value]


def label_to_hash(label: str) -> bytes:
    """reference create_merged.py:807-811 — labels must not contain dots."""
    if "." in label:
        raise ValueError(f"Cannot generate hash for label {label!r} with a '.'")
    return keccak256(label.encode("utf-8"))


def namehash(name: str) -> str:
    """ENS namehash: keccak chain over reversed dot-split labels, hex with
    0x prefix (reference normal_name_to_hash, create_merged.py:814-826)."""
    node = EMPTY_NODE
    if name:
        for label in reversed(name.split(".")):
            node = keccak256(node + label_to_hash(label))
    return "0x" + node.hex()


def namehash_batch(names: list[str | None]) -> list[str | None]:
    """Batch namehash. Single-TLD names (one dot, e.g. "label.eth" — the
    pipeline's only shape) chain two batched keccaks via a cached TLD
    node; anything else falls back to the scalar chain. Differential-
    tested against ``namehash`` in tests/test_hashing_batch.py."""
    tld_nodes: dict[str, bytes] = {}
    flat_idx, flat_labels, flat_tlds = [], [], []
    out: list[str | None] = [None] * len(names)
    for i, name in enumerate(names):
        if name is None:
            continue
        parts = name.split(".")
        if len(parts) == 2 and parts[0]:
            flat_idx.append(i)
            flat_labels.append(parts[0].encode("utf-8"))
            flat_tlds.append(parts[1])
        else:
            out[i] = namehash(name)
    if flat_idx:
        for t in set(flat_tlds):
            tld_nodes[t] = keccak256(EMPTY_NODE + keccak256(t.encode("utf-8")))
        label_hashes = keccak256_batch(flat_labels)
        nodes = keccak256_batch(
            [tld_nodes[t] + h for t, h in zip(flat_tlds, label_hashes)]
        )
        for i, node in zip(flat_idx, nodes):
            out[i] = "0x" + node.hex()
    return out
