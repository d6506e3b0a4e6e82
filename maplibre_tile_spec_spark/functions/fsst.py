"""Faithful FSST symbol-table builder (byte-parity with the reference).

The reference encodes string dictionaries with an FSST port
(java/mlt-core/.../converter/encodings/fsst/SymbolTableBuilder.java:45-354,
Symbol.java:13-103, Fsst.java:7-45): 6 sampled iterations over ≤30 kB,
candidate gains = count×length, a 255-symbol table, escape byte 255. Its
output depends not only on the algorithm but on two Java library artifacts:

* candidate-gain accumulation uses ``HashMap<Symbol, Long>`` — the
  **iteration order** of that map decides the order candidates enter the
  priority queue;
* the queue is ``java.util.PriorityQueue`` — a binary heap whose pop order
  among **equal gains** depends on insertion order and heap shape.

Equal-gain ties at the 255-symbol cutoff are common, so byte parity
requires reproducing both orders exactly. This module therefore carries a
minimal, behavior-accurate model of Java's HashMap (hash spreading
``h ^ (h >>> 16)``, power-of-two tables from capacity 16, load factor
0.75, insertion-ordered bucket chains, order-preserving lo/hi resize
splits) and of PriorityQueue's siftUp/siftDown. Symbol.hashCode is also
reproduced exactly — including the reference's quirk that ``concat``
hashes the *untruncated* byte sequence, so two symbols with identical
truncated bytes can legitimately occupy distinct map entries.

Everything here is reimplemented from observed behavior; no Java code is
copied. Treeified HashMap bins (8-chain at ≥64 capacity, probability
~1e-7 per bucket) are not modeled.
"""

from __future__ import annotations

MAX_SYMBOL_LENGTH = 8
NUM_ITERS = 6
DEFAULT_SAMPLE_SIZE = 30_000
_MIN_COUNT = 5

_I32 = 0xFFFFFFFF


def _i32(x: int) -> int:
    x &= _I32
    return x - 0x100000000 if x & 0x80000000 else x


def _sym_hash_of(byte: int) -> int:
    b = byte - 256 if byte >= 128 else byte  # (byte) cast is signed
    return _i32(31 + b)


def _sym_hash_concat(ah: int, b_bytes: bytes) -> int:
    h = ah
    for bb in b_bytes:
        sb = bb - 256 if bb >= 128 else bb
        h = _i32(31 * h + sb)
    return h


def _spread(h: int) -> int:
    u = h & _I32
    return (u ^ (u >> 16)) & _I32


class _JMap:
    """Java-HashMap-iteration-order-accurate map from (hash, bytes) → gain."""

    def __init__(self):
        self._table: list[list] = [[] for _ in range(16)]
        self._threshold = 12
        self._size = 0

    def merge_add(self, raw_hash: int, key_bytes: bytes, gain: int) -> None:
        # HashMap.merge resizes on ENTRY (when size already exceeds the
        # threshold), and inserts new nodes at the bucket HEAD — unlike
        # put(), which appends at the tail; both details shift iteration
        # order and thus the tie order at the 255-symbol cutoff.
        # Nodes keep the RAW Symbol.hashCode (it must survive into the next
        # round's table unchanged), bucketing uses the spread hash.
        if self._size > self._threshold:
            self._resize()
        spread_hash = _spread(raw_hash)
        mask = len(self._table) - 1
        bucket = self._table[spread_hash & mask]
        for node in bucket:
            if node[0] == spread_hash and node[1] == key_bytes:
                node[2] += gain
                return
        bucket.insert(0, [spread_hash, key_bytes, gain, raw_hash])
        self._size += 1

    def _resize(self) -> None:
        old = self._table
        old_cap = len(old)
        new_cap = old_cap * 2
        self._threshold = (new_cap * 3) // 4
        table = [[] for _ in range(new_cap)]
        for j, bucket in enumerate(old):
            for node in bucket:  # lo/hi split preserves chain order
                if node[0] & old_cap:
                    table[j + old_cap].append(node)
                else:
                    table[j].append(node)
        self._table = table

    def entries(self):
        """(raw_hash, bytes, gain) in Java HashMap iteration order."""
        for bucket in self._table:
            for node in bucket:
                yield node[3], node[1], node[2]


class _JPQ:
    """java.util.PriorityQueue heap order, max-by-gain comparator."""

    def __init__(self):
        self._h: list[tuple[int, bytes, int]] = []  # (gain, bytes, hash)

    @staticmethod
    def _less(a, b) -> bool:
        # comparator: Long.compare(o.gain, gain) < 0  ⇔  a.gain > b.gain
        return a[0] > b[0]

    def add(self, item) -> None:
        h = self._h
        k = len(h)
        h.append(item)
        while k > 0:
            parent = (k - 1) >> 1
            if not self._less(item, h[parent]):
                break
            h[k] = h[parent]
            k = parent
        h[k] = item

    def poll(self):
        h = self._h
        head = h[0]
        last = h.pop()
        n = len(h)
        if n:
            k = 0
            half = n >> 1
            while k < half:
                child = 2 * k + 1
                right = child + 1
                if right < n and self._less(h[right], h[child]):
                    child = right
                if not self._less(h[child], last):
                    break
                h[k] = h[child]
                k = child
            h[k] = last
        return head

    def __len__(self) -> int:
        return len(self._h)


def _sym_cmp(a: bytes, b: bytes) -> int:
    # lexicographic unsigned, except a proper prefix sorts AFTER the longer
    # symbol (Symbol.compareTo); equal bytes compare 0 (sort is stable on
    # duplicates, like Arrays.sort's TimSort)
    m = min(len(a), len(b))
    for i in range(m):
        if a[i] != b[i]:
            return -1 if a[i] < b[i] else 1
    return len(b) - len(a)


class _Builder:
    __slots__ = (
        "sample_size", "sym_bytes", "sym_hash", "n_symbols",
        "s_index", "s_first2", "by_len", "by_len_rev",
    )

    def __init__(self, sample_size: int):
        self.sample_size = sample_size
        # slots 0..255: single-byte escape symbols; 256..: table symbols
        self.sym_bytes: list[bytes] = [bytes([c]) for c in range(256)]
        self.sym_hash: list[int] = [_sym_hash_of(c) for c in range(256)]
        self.n_symbols = 0
        self.s_index = [0] * 256
        self.s_first2: dict[int, int] = {}
        self.by_len: list[int] = []
        self.by_len_rev: list[int] = []

    # -- lookup --------------------------------------------------------------
    def find_longest(self, text: bytes, offset: int) -> int:
        n = len(text)
        if n - offset >= 2:
            a = (text[offset] << 8) | text[offset + 1]
            start = self.s_first2.get(a, 0)
            if start > 0:
                end = self.s_first2.get(a + 1, 0)
                for code in range(start, end):
                    sb = self.sym_bytes[code]
                    if text[offset + 2 : offset + len(sb)] == sb[2:] and offset + len(sb) <= n:
                        return code
        letter = text[offset]
        code = self.s_index[letter]
        if code >= 256:
            return code
        return letter

    # -- statistics ----------------------------------------------------------
    def _ranges(self, size: int):
        if size < self.sample_size:
            return [(0, size)]
        chunk = 1000
        samples = self.sample_size // chunk
        offset = size // samples
        return [(i * offset, min(size, i * offset + chunk)) for i in range(samples)]

    def compress_count(self, count1, count2, text: bytes, second_pass: bool) -> int:
        if not text:
            return 0
        weight = 0
        for start, end in self._ranges(len(text)):
            code1 = self.find_longest(text, start)
            sym_len = len(self.sym_bytes[code1])
            cur = start + sym_len
            start = cur
            weight += 2 if code1 < 256 else 1
            while cur < end:
                count1[code1] += 1
                if sym_len > 1:
                    count1[text[start]] += 1
                start = cur
                code2 = self.find_longest(text, cur)
                sym_len2 = len(self.sym_bytes[code2])
                cur += sym_len2
                weight += 2 if code2 < 256 else 1
                if second_pass:
                    count2[(code1 << 9) | code2] += 1
                    if sym_len2 > 1:
                        count2[(code1 << 9) | text[start]] += 1
                code1 = code2
                sym_len = sym_len2
        for i in range(self.n_symbols):
            weight += len(self.sym_bytes[256 + i]) + 1
        return weight

    # -- table construction ---------------------------------------------------
    def make_table(self, count1, count2, last_pass: bool, sampled: bool) -> "_Builder":
        cands = _JMap()

        def add_or_inc(sbytes: bytes, shash: int, count: int, mn: int) -> None:
            if count >= mn:
                cands.merge_add(shash, sbytes, count * len(sbytes))

        mx = 256 + self.n_symbols
        single_min = 1 if (last_pass and not sampled) else _MIN_COUNT
        for pos1 in range(mx):
            cnt1 = count1[pos1]
            if cnt1 <= 0:
                continue
            s1b = self.sym_bytes[pos1]
            s1h = self.sym_hash[pos1]
            add_or_inc(s1b, s1h, (8 if len(s1b) == 1 else 1) * cnt1, single_min)
            if last_pass or len(s1b) == MAX_SYMBOL_LENGTH:
                continue
            base2 = pos1 << 9
            for pos2 in range(mx):
                cnt2 = count2[base2 | pos2]
                if cnt2 < _MIN_COUNT:
                    continue
                s2b = self.sym_bytes[pos2]
                cat = (s1b + s2b)[:MAX_SYMBOL_LENGTH]
                add_or_inc(cat, _sym_hash_concat(s1h, s2b), cnt2, _MIN_COUNT)

        pq = _JPQ()
        for shash, sbytes, gain in cands.entries():
            pq.add((gain, sbytes, shash))
        st = _Builder(self.sample_size)
        while st.n_symbols < 255 and len(pq):
            gain, sbytes, shash = pq.poll()
            if not last_pass or sampled:
                st._add(sbytes, shash)
            else:
                costs = len(sbytes) + 1
                saves = gain // 8 if len(sbytes) == 1 else gain
                if saves > costs:
                    st._add(sbytes, shash)
        return st._finish()

    def _add(self, sbytes: bytes, shash: int) -> None:
        slot = 256 + self.n_symbols
        if slot == len(self.sym_bytes):
            self.sym_bytes.append(sbytes)
            self.sym_hash.append(shash)
        else:
            self.sym_bytes[slot] = sbytes
            self.sym_hash[slot] = shash
        self.n_symbols += 1

    def _finish(self) -> "_Builder":
        import functools

        order = sorted(
            range(self.n_symbols),
            key=functools.cmp_to_key(
                lambda i, j: _sym_cmp(self.sym_bytes[256 + i], self.sym_bytes[256 + j])
            ),
        )
        tmp_b = [self.sym_bytes[256 + i] for i in order]
        tmp_h = [self.sym_hash[256 + i] for i in order]
        for i in range(self.n_symbols - 1, -1, -1):
            b = tmp_b[i]
            if len(b) >= 2:
                val = (b[0] << 8) | b[1]
                self.s_first2[val] = 256 + i
                if self.s_first2.get(val + 1, 0) == 0:
                    self.s_first2[val + 1] = 256 + i + 1
            else:
                self.s_index[b[0]] = 256 + i
            self.sym_bytes[256 + i] = b
            self.sym_hash[256 + i] = tmp_h[i]
        return self

    def _sort_by_length(self) -> None:
        self.by_len = [0] * self.n_symbols
        self.by_len_rev = [0] * self.n_symbols
        idx = 0
        for b in list(range(2, MAX_SYMBOL_LENGTH + 1)) + [MAX_SYMBOL_LENGTH + 1]:
            ln = 1 if b > MAX_SYMBOL_LENGTH else b
            for i in range(self.n_symbols):
                if len(self.sym_bytes[256 + i]) == ln:
                    self.by_len[i] = idx
                    self.by_len_rev[idx] = i
                    idx += 1

    # -- final encode ----------------------------------------------------------
    def encode(self, text: bytes) -> tuple[bytes, list[int], bytes]:
        self._sort_by_length()
        lens = [len(self.sym_bytes[256 + self.by_len_rev[i]]) for i in range(self.n_symbols)]
        table = b"".join(self.sym_bytes[256 + self.by_len_rev[i]] for i in range(self.n_symbols))
        out = bytearray()
        i = 0
        n = len(text)
        while i < n:
            code = self.find_longest(text, i)
            if code < 256:
                out.append(255)
                out.append(text[i])
                i += 1
            else:
                symbol = self.by_len[code - 256]
                out.append(symbol)
                i += lens[symbol]
        return table, lens, bytes(out)


def build_and_encode(data: bytes, sample_size: int = DEFAULT_SAMPLE_SIZE):
    """SymbolTableBuilder.encode: 6 sampled iterations, keep the best-weight
    table, rebuild once more with single-count filtering, encode the full
    corpus. Returns (symbol_table_bytes, symbol_lengths, compressed)."""
    sampled = sample_size < len(data)
    st = _Builder(sample_size)
    best = st
    best_weight = None
    best_counts = None
    for i in range(1, NUM_ITERS + 1):
        count1 = [0] * 512
        count2 = [0] * (512 * 512) if i < NUM_ITERS else _ZeroCounts()
        weight = st.compress_count(count1, count2, data, i < NUM_ITERS)
        if best_weight is None or weight <= best_weight:
            best_counts = (count1, count2)
            best = st
            best_weight = weight
        if i < NUM_ITERS:
            st = st.make_table(count1, count2, last_pass=False, sampled=sampled)
    result = best.make_table(best_counts[0], best_counts[1], last_pass=True, sampled=sampled)
    return result.encode(data)


class _ZeroCounts:
    """count2 stand-in for the final statistics pass (pairs not counted)."""

    def __getitem__(self, _):
        return 0

    def __setitem__(self, _, __):
        raise AssertionError("count2 must not be written on the final pass")
