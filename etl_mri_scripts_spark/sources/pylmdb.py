"""Pure-Python LMDB (liblmdb 0.9.x) on-disk format: writer + reader.

The container has no ``lmdb`` wheel (C extension, no network), but the
export sink's contract is the REAL file format (reference writes actual
LMDB stores: lmdb_util.py:9-133, v2/lmdb_npy.py:24-57). This module
implements the byte layout of ``data.mdb`` from the public liblmdb
sources (mdb.c / lmdb.h, OpenLDAP) for the subset the sink needs:

* bulk-build writes (batched commits, tree written at close) with a
  CRC-framed sidecar WAL (``data.mdb-wal``) making every commit()
  crash-recoverable — see Environment's docstring for the model
* point reads (``txn.get``) against the finished store

Layout written (4096-byte pages, little-endian, 64-bit):

* page 0 / page 1 — meta pages: 16-byte page header (pgno u64, pad u16,
  flags u16 = P_META, lower u16, upper u16) + MDB_meta {magic u32 =
  0xBEEFC0DE, version u32 = 1, address u64, mapsize u64, MDB_db[2]
  (FREE, MAIN), last_pg u64, txnid u64}; MDB_db {pad u32, flags u16,
  depth u16, branch_pages u64, leaf_pages u64, overflow_pages u64,
  entries u64, root u64}. Readers use the meta with the higher txnid.
* leaf pages — header (flags = P_LEAF, lower = 16 + 2*nkeys, upper =
  offset of lowest node), ascending u16 node-offset array at byte 16,
  nodes packed downward from byte 4096. Node: {lo u16, hi u16, flags
  u16, ksize u16, key bytes, value bytes}, 2-byte aligned; value size =
  lo | hi << 16. Values where 8 + ksize + dsize > nodemax (2038) go to
  overflow pages: node flags F_BIGDATA, payload = key bytes + u64 pgno.
* overflow pages — header {pgno, pad, flags = P_OVERFLOW, pages u32},
  value bytes from byte 16 spanning ``(15 + size) // 4096 + 1`` pages.
* branch pages — header (flags = P_BRANCH), node payload = separator
  key only, child pgno packed in {lo, hi, flags} (48-bit); node 0 of
  every branch page has ksize 0 (implicit leftmost separator).

The API mirrors the ``lmdb`` package's slice used by the sink
(``open``/``Environment.begin``/``Transaction.put``/``get``/``commit``/
``Environment.close``) so ``sources/lmdb_export.py`` can fall back to it
transparently; when the real wheel IS present the same files round-trip
through it (tests/test_sinks.py cross-checks when importable).
"""

from __future__ import annotations

import builtins
import mmap
import os
import struct
import zlib

PAGESIZE = 4096
PAGEHDRSZ = 16
USABLE = PAGESIZE - PAGEHDRSZ

P_BRANCH = 0x01
P_LEAF = 0x02
P_OVERFLOW = 0x04
P_META = 0x08

F_BIGDATA = 0x01

MAGIC = 0xBEEFC0DE
VERSION = 1
P_INVALID = 0xFFFFFFFFFFFFFFFF

# sidecar write-ahead log (pylmdb-specific, NOT part of the lmdb format;
# removed on clean close): <u32 klen><u32 vlen><key><value><u32 crc>
_WALHDR = struct.Struct("<II")
_WALCRC = struct.Struct("<I")


def _fsync_dir(path: str) -> None:
    """Durability for directory-entry mutations (create/rename/unlink):
    fsync the directory fd, best-effort on platforms without O_DIRECTORY
    semantics (the data-file fsyncs still hold there)."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)

# mdb.c: me_nodemax = (((psize - PAGEHDRSZ) / MDB_MINKEYS) & -2)
#                     - sizeof(indx_t),  MINKEYS=2
# = 2038 for 4096-byte pages. The trailing indx_t subtraction matters:
# it makes exactly two maximal inline nodes (plus their index entries)
# fill a page, and it is the real library's inline/F_BIGDATA boundary —
# verified empirically against liblmdb 0.9.31 (total 2038 inlines,
# 2039 spills; tests/test_round5_additions.py pins it).
NODEMAX = (((PAGESIZE - PAGEHDRSZ) // 2) & ~1) - 2  # 2038

# mdb.c ENV_MAXKEY default (MDB_MAXKEYSIZE): 511 bytes
MAXKEYSIZE = 511

_PAGEHDR = struct.Struct("<QHHHH")  # pgno, pad, flags, lower, upper
_OVHDR = struct.Struct("<QHHI")  # pgno, pad, flags, pages
_NODEHDR = struct.Struct("<HHHH")  # lo, hi, flags, ksize
_DB = struct.Struct("<IHHQQQQQ")  # pad, flags, depth, branch, leaf, ovf, entries, root
_METAHEAD = struct.Struct("<IIQQ")  # magic, version, address, mapsize


def _even(n: int) -> int:
    return (n + 1) & ~1


def _node_need(node_size: int) -> int:
    """Page bytes one node consumes: the 2-byte-aligned node itself plus
    its mp_ptrs index entry. THE page-capacity rule — every grouping and
    rendering decision must go through this one definition."""
    return _even(node_size) + 2


def _rebalance_tail(groups: list[list], need_of) -> None:
    """Best-effort MDB_MINKEYS hygiene — NOT a guarantee. The exact
    rule: a 1-node trailing page is repaired by stealing the previous
    page's last node only when (a) the donor would keep >= 2 nodes after
    the steal (so it needs > 2 before) and (b) the stolen pair fits one
    page. Outside those conditions 1-node trailing pages REMAIN — e.g.
    three maximal inline nodes pack 2+1 (donor has exactly 2, and two
    maximal nodes already fill a page so a third can't join) — so "every
    non-root page keeps >= 2 nodes" does NOT hold in general. Real
    liblmdb's own splitter produces 1-node leaf pages for such oversized
    nodes too (its MINKEYS enforcement is a delete-time rebalance, not a
    write-layout invariant), so readers must and do tolerate them; the
    fuzz test asserts the precise conditional invariant above."""
    if (
        len(groups) > 1
        and len(groups[-1]) == 1
        and len(groups[-2]) > 2
        and need_of(groups[-2][-1]) + need_of(groups[-1][0]) <= USABLE
    ):
        groups[-1].insert(0, groups[-2].pop())


def _ovpages(size: int) -> int:
    # mdb.c OVPAGES(): ((PAGEHDRSZ - 1 + size) / psize) + 1
    return (PAGEHDRSZ - 1 + size) // PAGESIZE + 1


class _Page:
    """One in-construction data page (leaf or branch)."""

    def __init__(self, flags: int) -> None:
        self.flags = flags
        self.nodes: list[bytes] = []
        self.used = 0  # node bytes + ptr entries consumed so far

    def add(self, node: bytes) -> None:
        self.nodes.append(node)
        self.used += _node_need(len(node))
        assert self.used <= USABLE, "page overfull — grouping must pre-check _node_need"

    def render(self, pgno: int) -> bytes:
        ptrs: list[int] = []
        tail = bytearray()
        offset = PAGESIZE
        for node in self.nodes:
            offset -= _even(len(node))
            ptrs.append(offset)
            chunk = node + (b"\x00" if len(node) & 1 else b"")
            tail[0:0] = chunk  # nodes pack downward; ptrs stay ascending
        lower = PAGEHDRSZ + 2 * len(self.nodes)
        upper = offset
        out = bytearray(PAGESIZE)
        _PAGEHDR.pack_into(out, 0, pgno, 0, self.flags, lower, upper)
        struct.pack_into(f"<{len(ptrs)}H", out, PAGEHDRSZ, *ptrs)
        out[upper:] = tail
        return bytes(out)


def _leaf_node(key: bytes, value: bytes, big_pgno: int | None) -> bytes:
    if big_pgno is None:
        hdr = _NODEHDR.pack(len(value) & 0xFFFF, len(value) >> 16, 0, len(key))
        return hdr + key + value
    hdr = _NODEHDR.pack(len(value) & 0xFFFF, len(value) >> 16, F_BIGDATA, len(key))
    return hdr + key + struct.pack("<Q", big_pgno)


def _branch_node(key: bytes, child_pgno: int) -> bytes:
    hdr = _NODEHDR.pack(
        child_pgno & 0xFFFF, (child_pgno >> 16) & 0xFFFF, child_pgno >> 32, len(key)
    )
    return hdr + key


def _emit_tree(items, emit) -> dict[str, int]:
    """Bulk-build the MAIN db B-tree from an iterator of SORTED (key,
    value) pairs, calling ``emit(page_bytes)`` for every rendered page in
    pgno order. Returns the stats for the meta MDB_db.

    Streaming core of :func:`_build_tree` (r7): page layout and numbering
    are IDENTICAL to the historical list form (byte pins in
    tests/test_round5_additions.py hold) — only the residency changes.
    Memory is O(page) plus O(#leaf pages) for the branch-level key list:
    a leaf group is rendered and emitted as soon as the NEXT-next group
    starts (the last TWO groups stay buffered because _rebalance_tail may
    move one node between them at end-of-stream), so values never
    accumulate. Page numbers start at 2 (after the two metas)."""
    next_pgno = 2
    leaves: list[tuple[bytes, int]] = []  # (first_key, pgno)
    n_leaf = n_ovf = 0
    n_items = 0

    def render_group(group: list[tuple[bytes, bytes, bool]]) -> None:
        nonlocal next_pgno, n_leaf, n_ovf
        leaf_pgno = next_pgno
        next_pgno += 1
        page = _Page(P_LEAF)
        ovf_chunks: list[bytes] = []
        # overflow pages land right after their owning leaf, as mdb_put
        # would allocate them
        for key, value, inline in group:
            if inline:
                page.add(_leaf_node(key, value, None))
            else:
                npg = _ovpages(len(value))
                ov = bytearray(npg * PAGESIZE)
                _OVHDR.pack_into(ov, 0, next_pgno, 0, P_OVERFLOW, npg)
                ov[PAGEHDRSZ : PAGEHDRSZ + len(value)] = value
                ovf_chunks.append(bytes(ov))
                page.add(_leaf_node(key, value, next_pgno))
                next_pgno += npg
                n_ovf += npg
        emit(page.render(leaf_pgno))
        for ch in ovf_chunks:
            emit(ch)
        leaves.append((group[0][0], leaf_pgno))
        n_leaf += 1

    # ---- group items into leaves by size; keep only the trailing two
    # groups unrendered (the _rebalance_tail window) ----
    pending: list[list[tuple[bytes, bytes, bool]]] = []
    cur: list[tuple[bytes, bytes, bool]] = []
    used = 0
    for key, value in items:
        n_items += 1
        inline = _NODEHDR.size + len(key) + len(value) <= NODEMAX
        node_size = _NODEHDR.size + len(key) + (len(value) if inline else 8)
        need = _node_need(node_size)
        if cur and used + need > USABLE:
            pending.append(cur)
            if len(pending) > 2:
                render_group(pending.pop(0))
            cur, used = [], 0
        cur.append((key, value, inline))
        used += need
    if cur:
        pending.append(cur)
        if len(pending) > 2:
            render_group(pending.pop(0))
    _rebalance_tail(
        pending,
        lambda it: _node_need(
            _NODEHDR.size + len(it[0]) + (len(it[1]) if it[2] else 8)
        ),
    )
    for group in pending:
        render_group(group)

    # ---- branch levels, bottom-up ----
    depth = 1 if n_items else 0
    n_branch = 0
    level = leaves
    while len(level) > 1:
        depth += 1
        nxt: list[tuple[bytes, int]] = []
        bgroups: list[list[tuple[bytes, int]]] = []
        bcur: list[tuple[bytes, int]] = []
        used = 0
        for key, child in level:
            sep_len = 0 if not bcur else len(key)
            need = _node_need(_NODEHDR.size + sep_len)
            if bcur and used + need > USABLE:
                bgroups.append(bcur)
                bcur, used = [], 0
                need = _node_need(_NODEHDR.size)  # first node: empty sep
            bcur.append((key, child))
            used += need
        if bcur:
            bgroups.append(bcur)
        # sep keys are <= MAXKEYSIZE, so any two branch nodes fit
        _rebalance_tail(bgroups, lambda it: _node_need(_NODEHDR.size + len(it[0])))
        for bgroup in bgroups:
            page = _Page(P_BRANCH)
            for i, (k, child) in enumerate(bgroup):
                page.add(_branch_node(b"" if i == 0 else k, child))
            emit(page.render(next_pgno))
            nxt.append((bgroup[0][0], next_pgno))
            next_pgno += 1
            n_branch += 1
        level = nxt

    root = level[0][1] if level else P_INVALID
    if not n_items:
        depth = 0
    return {
        "depth": depth,
        "branch_pages": n_branch,
        "leaf_pages": n_leaf,
        "overflow_pages": n_ovf,
        "entries": n_items,
        "root": root,
        "last_pg": next_pgno - 1,
    }


def _build_tree(items: list[tuple[bytes, bytes]]) -> tuple[bytes, dict[str, int]]:
    """List-in/bytes-out wrapper over :func:`_emit_tree` (kept for the
    byte-pin tests and any small-store caller that wants the body whole)."""
    pages: list[bytes] = []
    stats = _emit_tree(iter(items), pages.append)
    return b"".join(pages), stats


def _meta_page(pgno: int, txnid: int, mapsize: int, stats: dict[str, int] | None) -> bytes:
    out = bytearray(PAGESIZE)
    _PAGEHDR.pack_into(out, 0, pgno, 0, P_META, 0, 0)
    off = PAGEHDRSZ
    _METAHEAD.pack_into(out, off, MAGIC, VERSION, 0, mapsize)
    off += _METAHEAD.size
    # FREE db: empty EXCEPT its pad field — liblmdb aliases it as the
    # persisted page size (mdb.c: #define mm_psize mm_dbs[FREE_DBI].md_pad);
    # a zero here makes the real library divide by zero computing
    # mapsize / psize at open.
    _DB.pack_into(out, off, PAGESIZE, 0, 0, 0, 0, 0, 0, P_INVALID)
    off += _DB.size
    if stats is None:
        _DB.pack_into(out, off, 0, 0, 0, 0, 0, 0, 0, P_INVALID)
        off += _DB.size
        struct.pack_into("<QQ", out, off, 1, txnid)  # last_pg, txnid
    else:
        _DB.pack_into(
            out,
            off,
            0,
            0,
            stats["depth"],
            stats["branch_pages"],
            stats["leaf_pages"],
            stats["overflow_pages"],
            stats["entries"],
            stats["root"],
        )
        off += _DB.size
        struct.pack_into("<QQ", out, off, stats["last_pg"], txnid)
    return bytes(out)


class Transaction:
    def __init__(self, env: "Environment", write: bool) -> None:
        if write and env.readonly:
            raise EnvironmentError("read-only environment")
        self._env = env
        self._write = write
        self._staged: dict[bytes, bytes] = {}

    # -- context manager: commit on clean exit, like the lmdb package --
    def __enter__(self) -> "Transaction":
        return self

    def __exit__(self, exc_type, *_exc) -> None:
        if exc_type is None and self._write:
            self.commit()

    def put(self, key: bytes, value: bytes) -> bool:
        if not self._write:
            raise EnvironmentError("put on read-only txn")
        if not 0 < len(key) <= MAXKEYSIZE:
            # real lmdb: MDB_BAD_VALSIZE at put(); failing here (not at
            # close) keeps the error at the faulty call and preserves
            # every other committed entry
            raise EnvironmentError(
                f"MDB_BAD_VALSIZE: key length {len(key)} not in 1..{MAXKEYSIZE}"
            )
        self._staged[bytes(key)] = bytes(value)
        return True

    def get(self, key: bytes, default: bytes | None = None) -> bytes | None:
        if key in self._staged:
            return self._staged[key]
        got = self._env._read_from_wal(bytes(key))
        if got is not None:
            return got
        got = self._env._read_from_file(bytes(key))
        return got if got is not None else default

    def commit(self) -> None:
        if self._write and self._staged:
            self._env._commit_entries(self._staged)
        self._staged = {}

    def abort(self) -> None:
        self._staged = {}


class Environment:
    """Subset of ``lmdb.Environment``: bulk-build writes, point reads.

    Durability model (r7, WAL tier — closes the r6 'commit is not
    durable / memory is O(store)' caveat): ``Transaction.commit()``
    appends the staged entries to a sidecar write-ahead log
    (``data.mdb-wal``: CRC-framed records, flushed + fsync'd per commit)
    and keeps only a key -> (offset, length) index in memory — committed
    VALUES never reside in RAM, so writer memory is O(commit batch) +
    O(keys). A crash between commit and close loses nothing: the next
    non-readonly open replays every intact WAL frame (truncating a torn
    tail at the first bad CRC) and close() then merges WAL + any
    pre-existing store. ``close()`` streams the merge through
    :func:`_emit_tree` into ``data.mdb.tmp`` and atomically
    ``os.replace``s it over the store before deleting the WAL, so a
    crash DURING close leaves the old store + WAL intact and recovery
    still holds. The final file is the same compact bulk-built layout
    as before (byte pins hold); liblmdb's COW page format is still only
    written whole-at-close — the wheel/ctypes tiers keep real per-commit
    B-tree durability."""

    def __init__(self, path: str, map_size: int, readonly: bool, subdir: bool) -> None:
        self.readonly = readonly
        self.map_size = map_size
        if subdir:
            os.makedirs(path, exist_ok=True)
            self.datafile = os.path.join(path, "data.mdb")
        else:
            self.datafile = path
        self.walfile = self.datafile + "-wal"
        self._index: dict[bytes, tuple[int, int]] = {}  # key -> (val off, len)
        self._wal = None  # append handle, opened on first commit/replay
        self._wal_read = None  # seek/read handle for gets
        self._dirty = False
        self._buf = None  # mmap (or bytes) of datafile for reads
        self._closed = False
        if os.path.exists(self.walfile):
            if readonly:
                # A non-empty WAL means a writer committed but never
                # closed. Those commits ARE durable state (the docstring's
                # promise), so a readonly reader must serve them too:
                # replay into the in-memory index only — never truncate or
                # delete, both of which are writes a readonly open must
                # not perform (r7 ADVICE: the old behavior silently served
                # the previous close's tree, missing committed entries).
                # Open the WAL fd exactly ONCE and both replay and serve
                # gets through it (r8 ADVICE): the previous shape opened
                # one fd to replay and a SECOND to guard against a
                # concurrent merge+unlink, so a writer unlinking between
                # the two opens still raised FileNotFoundError — the exact
                # race the held fd exists to cover. A single held fd keeps
                # the indexed bytes readable past any unlink (POSIX); a
                # vanished WAL here means a concurrent writer already
                # merged it into the store file this reader will serve.
                try:
                    wal_fd = builtins.open(self.walfile, "rb")
                except FileNotFoundError:
                    wal_fd = None  # merged+unlinked since the exists() check
                if wal_fd is not None:
                    self._replay_wal(truncate=False, fobj=wal_fd)
                    if self._index:
                        self._wal_read = wal_fd
                    else:
                        wal_fd.close()
            else:
                # crash recovery: replay every intact frame so close()
                # merges them (truncating any torn tail frame)
                self._replay_wal()
                self._dirty = bool(self._index)

    def begin(self, write: bool = False, **_kw) -> Transaction:
        if self._closed:
            raise EnvironmentError("environment closed")
        return Transaction(self, write)

    # ------------------------------ WAL ---------------------------------
    # Frame: <u32 klen><u32 vlen><key><value><u32 crc32(key+value)>.
    # Append-only; fsync per commit. The index maps each key to its
    # NEWEST value's (offset, length); older frames become dead bytes.

    def _commit_entries(self, staged: dict[bytes, bytes]) -> None:
        if self._wal is None:
            created = not os.path.exists(self.walfile)
            self._wal = builtins.open(self.walfile, "ab")
            if created:
                # fsync the DIRECTORY too: without it a power failure can
                # drop the brand-new dirent on ext4/xfs even though the
                # file's own bytes were fsync'd — losing every committed
                # entry while the docstring promises durability.
                _fsync_dir(os.path.dirname(self.walfile) or ".")
        pos = self._wal.tell()
        for k, v in staged.items():
            rec = _WALHDR.pack(len(k), len(v)) + k + v
            rec += _WALCRC.pack(zlib.crc32(k + v) & 0xFFFFFFFF)
            self._wal.write(rec)
            self._index[k] = (pos + _WALHDR.size + len(k), len(v))
            pos += len(rec)
        self._wal.flush()
        os.fsync(self._wal.fileno())
        self._dirty = True

    def _read_from_wal(self, key: bytes) -> bytes | None:
        loc = self._index.get(key)
        if loc is None:
            return None
        if self._wal_read is None:
            self._wal_read = builtins.open(self.walfile, "rb")
        self._wal_read.seek(loc[0])
        return self._wal_read.read(loc[1])

    def _replay_wal(self, truncate: bool = True, fobj=None) -> None:
        """Index every intact frame; truncate at the first torn/corrupt
        one (a crash mid-write leaves at most one partial tail frame —
        everything fsync'd by a completed commit() is before it).
        ``truncate=False`` (readonly opens) indexes the intact prefix but
        leaves the file untouched — the next WRITE open performs the
        actual repair. ``fobj``: an already-open read handle to replay
        through instead of opening a fresh one (readonly opens keep that
        SAME fd for gets, so there is no window between replay and guard
        in which a concurrent merge+unlink can strand the reader —
        r8 ADVICE). The caller owns a passed-in handle; it is left open
        and positioned arbitrarily."""
        good_end = 0
        f = fobj if fobj is not None else builtins.open(self.walfile, "rb")
        try:
            f.seek(0)
            size = os.fstat(f.fileno()).st_size
            while good_end + _WALHDR.size <= size:
                hdr = f.read(_WALHDR.size)
                if len(hdr) < _WALHDR.size:
                    break
                klen, vlen = _WALHDR.unpack(hdr)
                if not 0 < klen <= MAXKEYSIZE:
                    # put() bounds keys at MAXKEYSIZE, so an out-of-range
                    # klen is a corrupt header — reject BEFORE f.read(klen)
                    # can allocate a near-WAL-size buffer for a fake key
                    break
                frame_len = _WALHDR.size + klen + vlen + _WALCRC.size
                if good_end + frame_len > size:
                    break
                key = f.read(klen)
                crc = zlib.crc32(key)
                # stream the value so replay memory stays O(chunk)
                remaining = vlen
                while remaining:
                    chunk = f.read(min(remaining, 1 << 20))
                    if not chunk:
                        break
                    crc = zlib.crc32(chunk, crc)
                    remaining -= len(chunk)
                (want,) = _WALCRC.unpack(f.read(_WALCRC.size))
                if remaining or (crc & 0xFFFFFFFF) != want:
                    break
                self._index[key] = (good_end + _WALHDR.size + klen, vlen)
                good_end += frame_len
        finally:
            if fobj is None:
                f.close()
        if truncate and good_end < os.path.getsize(self.walfile):
            with builtins.open(self.walfile, "r+b") as f:
                f.truncate(good_end)

    def _merged_items(self):
        """Two-pointer merge of the existing store's ascending key stream
        with the (sorted) WAL index — WAL wins on ties (newer write).
        Yields (key, value) ascending; values are fetched lazily (file
        pages via mmap, WAL via seek/read), so the merge holds O(1)
        values."""
        wal_keys = sorted(self._index)
        wi = 0
        for fk, fv in self._iter_file():
            while wi < len(wal_keys) and wal_keys[wi] < fk:
                yield wal_keys[wi], self._read_from_wal(wal_keys[wi])
                wi += 1
            if wi < len(wal_keys) and wal_keys[wi] == fk:
                continue  # overwritten by the WAL; emitted on its turn
            yield fk, fv
        while wi < len(wal_keys):
            yield wal_keys[wi], self._read_from_wal(wal_keys[wi])
            wi += 1

    def close(self) -> None:
        if self._closed:
            return
        # Real lmdb materializes the meta pages on environment creation,
        # so even a store that never saw a put must leave a valid (empty)
        # data.mdb behind — otherwise an empty export partition ships a
        # store that readers cannot open.
        must_create = not self.readonly and not os.path.exists(self.datafile)
        if (self._dirty or must_create) and not self.readonly:
            tmp = self.datafile + ".tmp"
            with builtins.open(tmp, "wb") as f:
                f.write(b"\x00" * (2 * PAGESIZE))  # meta placeholders
                stats = _emit_tree(self._merged_items(), f.write)
                f.seek(0)
                f.write(_meta_page(0, 0, self.map_size, None))
                f.write(_meta_page(1, 1, self.map_size, stats))
                f.flush()
                os.fsync(f.fileno())
            self._drop_buf()  # release the mmap of the old file first
            os.replace(tmp, self.datafile)
            # make the rename durable BEFORE unlinking the WAL: on a
            # non-ordered filesystem the unlink could persist while the
            # rename did not, leaving the OLD store with NO WAL.
            _fsync_dir(os.path.dirname(self.datafile) or ".")
        for h in (self._wal, self._wal_read):
            if h is not None:
                h.close()
        self._wal = self._wal_read = None
        # Remove the WAL on every clean writer close, not just dirty ones:
        # a replay that salvaged ZERO frames (torn/corrupt first frame)
        # leaves _dirty False but a truncated data.mdb-wal behind, which
        # would read as false crash evidence forever. A non-empty replay
        # always sets _dirty, so the merged store is durable before any
        # WAL with content is removed.
        if not self.readonly and os.path.exists(self.walfile):
            os.remove(self.walfile)
            _fsync_dir(os.path.dirname(self.walfile) or ".")
        self._closed = True
        self._drop_buf()

    def _drop_buf(self) -> None:
        if self._buf is not None and hasattr(self._buf, "close"):
            self._buf.close()
        self._buf = None

    # ------------------------------ reader ------------------------------
    def _load(self):
        """mmap of the datafile (r7: disk-backed, so reading or merging a
        big store no longer costs O(store) resident memory; slicing an
        mmap returns bytes and struct.unpack_from accepts it directly).
        Falls back to a whole read only for files mmap refuses."""
        if self._buf is None:
            try:
                with builtins.open(self.datafile, "rb") as f:
                    try:
                        self._buf = mmap.mmap(
                            f.fileno(), 0, access=mmap.ACCESS_READ
                        )
                    except (ValueError, OSError):  # zero-length or no-mmap fs
                        self._buf = f.read()
            except OSError:
                return None
        return self._buf

    def _main_root(self, buf: bytes) -> int:
        metas = []
        for pg in (0, 1):
            base = pg * PAGESIZE
            _pgno, _pad, flags, _lo, _up = _PAGEHDR.unpack_from(buf, base)
            magic, version, _addr, _maps = _METAHEAD.unpack_from(buf, base + PAGEHDRSZ)
            if not (flags & P_META) or magic != MAGIC or version != VERSION:
                raise EnvironmentError(f"{self.datafile}: bad meta page {pg}")
            db_off = base + PAGEHDRSZ + _METAHEAD.size + _DB.size  # MAIN db
            main = _DB.unpack_from(buf, db_off)
            last_pg, txnid = struct.unpack_from("<QQ", buf, db_off + _DB.size)
            metas.append((txnid, main[7]))
        return max(metas)[1]  # root pgno of the newer meta

    def _node(self, buf: bytes, page_base: int, idx: int) -> tuple[bytes, int, int, int]:
        (ptr,) = struct.unpack_from("<H", buf, page_base + PAGEHDRSZ + 2 * idx)
        lo, hi, flags, ksize = _NODEHDR.unpack_from(buf, page_base + ptr)
        key = buf[page_base + ptr + 8 : page_base + ptr + 8 + ksize]
        return key, lo | (hi << 16), flags, page_base + ptr + 8 + ksize

    def _read_from_file(self, key: bytes) -> bytes | None:
        buf = self._load()
        if not buf:
            return None
        pgno = self._main_root(buf)
        if pgno == P_INVALID:
            return None
        while True:
            base = pgno * PAGESIZE
            _pg, _pad, flags, lower, _upper = _PAGEHDR.unpack_from(buf, base)
            nkeys = (lower - PAGEHDRSZ) >> 1
            if flags & P_BRANCH:
                # rightmost child whose separator <= key (node 0 implicit)
                child_idx = 0
                for i in range(1, nkeys):
                    sep, *_rest = self._node(buf, base, i)
                    if sep <= key:
                        child_idx = i
                    else:
                        break
                _sep, size48, nflags, _doff = self._node(buf, base, child_idx)
                pgno = size48 | (nflags << 32)
            elif flags & P_LEAF:
                for i in range(nkeys):
                    nkey, dsize, nflags, doff = self._node(buf, base, i)
                    if nkey == key:
                        if nflags & F_BIGDATA:
                            (ovpg,) = struct.unpack_from("<Q", buf, doff)
                            ovbase = ovpg * PAGESIZE
                            return buf[ovbase + PAGEHDRSZ : ovbase + PAGEHDRSZ + dsize]
                        return buf[doff : doff + dsize]
                return None
            else:
                raise EnvironmentError(f"{self.datafile}: bad page flags {flags:#x}")

    def _iter_file(self):
        """Yield every (key, value) in ASCENDING key order (r7: the
        close-time WAL merge is a sorted two-pointer stream, so the tree
        walk must come out in key order — children push reversed onto the
        LIFO stack)."""
        buf = self._load()
        if not buf:
            return
        root = self._main_root(buf)
        if root == P_INVALID:
            return
        stack = [root]
        leaves = []
        while stack:
            pgno = stack.pop()
            base = pgno * PAGESIZE
            _pg, _pad, flags, lower, _upper = _PAGEHDR.unpack_from(buf, base)
            nkeys = (lower - PAGEHDRSZ) >> 1
            if flags & P_BRANCH:
                for i in reversed(range(nkeys)):
                    _k, size48, nflags, _doff = self._node(buf, base, i)
                    stack.append(size48 | (nflags << 32))
            else:
                leaves.append(base)
        for base in leaves:
            _pg, _pad, _flags, lower, _upper = _PAGEHDR.unpack_from(buf, base)
            for i in range((lower - PAGEHDRSZ) >> 1):
                nkey, dsize, nflags, doff = self._node(buf, base, i)
                if nflags & F_BIGDATA:
                    (ovpg,) = struct.unpack_from("<Q", buf, doff)
                    ovbase = ovpg * PAGESIZE
                    yield nkey, buf[ovbase + PAGEHDRSZ : ovbase + PAGEHDRSZ + dsize]
                else:
                    yield nkey, buf[doff : doff + dsize]


def open(  # noqa: A001 - mirrors the lmdb package's module-level API
    path: str,
    map_size: int = 10 * 1024 * 1024,
    readonly: bool = False,
    lock: bool = True,  # accepted for API parity; no lock file is used
    subdir: bool = True,
    **_kw,
) -> Environment:
    return Environment(path, map_size, readonly, subdir)
