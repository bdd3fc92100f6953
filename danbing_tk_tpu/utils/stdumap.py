"""Pure-Python emulation of libstdc++ ``std::unordered_map``/``set``
iteration order for u64 keys with the identity hash.

Why: the reference toolchain serializes its hash containers in *iteration
order* (e.g. ktools serialize writes kmerDBi keys via ``for (auto& p :
kmerDBi)``, kmertools.cpp:265-281; fa2kmers writes ``.tr.kmers`` via map
iteration).  To produce byte-identical files from a from-scratch
implementation we replicate the container's deterministic node ordering:

* bucket index = key % bucket_count (std::hash<u64> is identity)
* insertion puts a node at the *front of its bucket's chain segment*; a
  node opening a new bucket goes to the front of the global singly-linked
  list (GCC _Hashtable::_M_insert_bucket_begin)
* rehash walks the current list in order and re-inserts each node
  front-of-bucket into the new bucket array (_M_rehash_aux)
* growth policy: _Prime_rehash_policy with max_load_factor 1.0 — rehash
  triggered when size+1 > bucket_count; new count = next prime >=
  max(size+2, 2*bucket_count) from libstdc++'s prime table

The policy constants are fuzz-verified against a real libstdc++ container by
tests/test_stdumap.py via native/probe_umap_order.cpp.

Performance note: this is O(n) per rehash and O(1) per insert; fine for
golden-path serialization (tens of millions of keys).  The index itself on
device uses our own open-addressing layout, not this.
"""

from __future__ import annotations

import os

_PRIMES: list[int] | None = None
_FAST_BKT = [1, 2, 2, 3, 5, 5, 7, 7, 11, 11, 11, 11, 13, 13]


def _load_primes() -> list[int]:
    global _PRIMES
    if _PRIMES is None:
        path = os.path.join(os.path.dirname(__file__), "gxx_prime_list.txt")
        with open(path) as f:
            _PRIMES = [int(x) for x in f.read().split()]
    return _PRIMES


def _next_bkt(n: int) -> int:
    if n < len(_FAST_BKT):
        return 1 if n == 0 else _FAST_BKT[n]
    primes = _load_primes()
    # lower_bound
    lo, hi = 0, len(primes)
    while lo < hi:
        mid = (lo + hi) // 2
        if primes[mid] < n:
            lo = mid + 1
        else:
            hi = mid
    return primes[lo]


class StdUmapOrder:
    """Tracks the iteration order of a libstdc++ unordered hash container
    under a sequence of unique-key insertions (no erases)."""

    __slots__ = ("nbkt", "next_resize", "size", "head", "nxt", "bucket_before")

    def __init__(self):
        self.nbkt = 1
        self.next_resize = 0
        self.size = 0
        self.head: int | None = None
        self.nxt: dict[int, int | None] = {}
        # bucket -> key whose node precedes the bucket's first node;
        # -1 denotes the before-begin sentinel (i.e. bucket starts the list)
        self.bucket_before: dict[int, int] = {}

    def __contains__(self, key: int) -> bool:
        return key in self.nxt

    def __len__(self) -> int:
        return self.size

    def insert(self, key: int) -> bool:
        """Insert key if absent. Returns True if newly inserted."""
        if key in self.nxt:
            return False
        # _M_need_rehash(nbkt, size, 1)
        if self.size + 1 > self.next_resize:
            min_bkts = max(self.size + 1, 11 if self.next_resize == 0 else 0)
            if min_bkts >= self.nbkt:
                self._rehash(_next_bkt(max(min_bkts + 1, self.nbkt * 2)))
            else:
                self.next_resize = self.nbkt
        self._insert_node(key)
        self.size += 1
        return True

    def _insert_node(self, key: int) -> None:
        b = key % self.nbkt
        bb = self.bucket_before.get(b)
        if bb is not None:
            prev_first = self.nxt[bb] if bb != -1 else self.head
            self.nxt[key] = prev_first
            if bb == -1:
                self.head = key
            else:
                self.nxt[bb] = key
        else:
            old_head = self.head
            self.nxt[key] = old_head
            self.head = key
            if old_head is not None:
                self.bucket_before[old_head % self.nbkt] = key
            self.bucket_before[b] = -1

    def clear(self) -> None:
        """unordered_map::clear(): drops all nodes but KEEPS the bucket
        count and rehash threshold (so post-clear insertion order differs
        from a fresh container's)."""
        self.size = 0
        self.head = None
        self.nxt = {}
        self.bucket_before = {}

    def erase(self, key: int) -> bool:
        """Remove key (matches _Hashtable::_M_erase: unlink from the global
        list, patch the bucket before-node pointers, no rehash)."""
        if key not in self.nxt:
            return False
        b = key % self.nbkt
        bb = self.bucket_before[b]
        # predecessor of key in the global list (walk this bucket's chain)
        prev = bb
        cur = self.head if bb == -1 else self.nxt[bb]
        while cur != key:
            prev = cur
            cur = self.nxt[cur]
        nxt = self.nxt[key]
        first_of_bucket = prev == bb
        if first_of_bucket:
            if nxt is None or nxt % self.nbkt != b:
                # bucket becomes empty
                if nxt is not None:
                    self.bucket_before[nxt % self.nbkt] = bb
                del self.bucket_before[b]
        else:
            if nxt is not None and nxt % self.nbkt != b:
                self.bucket_before[nxt % self.nbkt] = prev
        if prev == -1:
            self.head = nxt
        else:
            self.nxt[prev] = nxt
        del self.nxt[key]
        self.size -= 1
        return True

    def _rehash(self, new_nbkt: int) -> None:
        order = list(self)
        self.nbkt = new_nbkt
        self.next_resize = new_nbkt  # floor(prime * 1.0)
        self.head = None
        self.nxt = {}
        self.bucket_before = {}
        for key in order:
            self._insert_node(key)

    def __iter__(self):
        k = self.head
        while k is not None:
            yield k
            k = self.nxt[k]


def umap_iteration_order(keys) -> list[int]:
    """Iteration order of a libstdc++ u64 hash container after inserting
    ``keys`` in sequence (duplicates ignored)."""
    m = StdUmapOrder()
    for k in keys:
        m.insert(int(k))
    return list(m)
